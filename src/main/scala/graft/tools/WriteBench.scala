package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Distributed Zarr write-path scale bench:
 * `runMain graft.tools.WriteBench [rows] [chunkRows] [dir]`.
 *
 * Writes the same deterministic (int64, float64, vlen string) table through
 * the distributed row_index path as v3 and as v2 (`zarr_format=2`), both
 * zstd, times each, and validates by scanning back count + int64 sum. The
 * claim under test: v2 output shares the identical task-side path (same
 * chunk frames, same routing), so throughput must match v3 within noise —
 * only the O(columns) commit-time metadata spelling differs.
 */
object WriteBench {

  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(16L << 20)
    val chunkRows = if (args.length > 1) args(1).toInt else 1 << 20
    val base = if (args.length > 2) args(2)
      else Files.createTempDirectory("graft_wbench").toString
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val expectedSum = // sum of (id % 100003) over 0..rows-1, closed-form free
      spark.range(rows).select(sum(col("id") % 100003L)).head().getLong(0)

    def src = spark.range(rows).select(
      col("id").as("idx"),
      (col("id") % 100003L).as("v"),
      ((col("id") % 1000L) / 8.0).as("x"),
      concat(lit("doc"), col("id") % 100000L).as("name"))
      .repartition((col("idx") / chunkRows).cast("int"))
      .sortWithinPartitions("idx")

    def sizeOf(dir: String): Long = {
      val root = new java.io.File(dir)
      def walk(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(walk).sum).getOrElse(0L)
      walk(root)
    }

    for (fmt <- Seq("3", "2"); attempt <- 1 to 2) {
      val out = s"$base/store_v$fmt.zarr"
      val t0 = System.nanoTime()
      src.write.format("zarr").option("group", "/t")
        .option("chunk_rows", chunkRows.toString).option("row_index", "idx")
        .option("zarr_format", fmt).mode("overwrite").save(out)
      val wSec = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val back = spark.read.format("zarr").option("group", "/t").load(out)
        .agg(count(lit(1)), sum(col("v"))).head()
      val rSec = (System.nanoTime() - t1) / 1e9
      require(back.getLong(0) == rows && back.getLong(1) == expectedSum,
        s"v$fmt roundtrip mismatch: $back")
      println(f"v$fmt attempt $attempt: write $wSec%.1fs (${rows / wSec / 1e6}%.1fM rows/s) " +
        f"read $rSec%.1fs, ${sizeOf(out) / 1e6}%.0f MB on disk")
    }
    spark.stop()
  }
}
