package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Zarr source scale bench: `runMain graft.tools.ScanBench [rows] [chunkRows] [dir]`.
 *
 * Three measurements on one synthetic sharded store (written by our own DSv2
 * write path — the shape a 100 TB table would have, scaled to one node):
 *
 *  1. row-reader vs columnar-reader full-table scan at local[32]
 *     (the verdict's "≥2× scan speedup" gate for the ColumnarBatch reader);
 *  2. columnar scan at local[4] vs local[32] — near-linear task scaling is
 *     the evidence the per-shard partition math distributes (SCALE.md);
 *  3. planned task count == ceil(rows / target_partition_rows) — pins that
 *     parallelism comes from the chunk grid, not file count.
 *
 * Prints one JSON line per measurement plus a trailing summary line.
 */
object ScanBench {

  import BenchHarness.session
  private def timeBest(runs: Int)(body: => Unit): Double =
    BenchHarness.timeBest(runs, "scanbench")(body)

  private def read(spark: SparkSession, dir: String, columnar: Boolean, targetRows: Long): DataFrame =
    spark.read.format("zarr").option("group", "/t")
      .option("columnar", columnar.toString)
      .option("target_partition_rows", targetRows.toString)
      .load(dir)

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 16L * 1024 * 1024
    val chunkRows = if (args.length > 1) args(1).toInt else 1 << 19 // 512k-row shards
    val dir = if (args.length > 2) args(2) else "/tmp/graft_scanbench/store.zarr"
    val compression = if (args.length > 3) args(3) else "zstd"
    val shardRows = chunkRows / 8 // inner chunks: 8 per shard
    val runs = 5

    // ---- write the store (local[32], distributed chunk-aligned write) ----
    var spark = session(32)
    val nShards = ((rows + chunkRows - 1) / chunkRows).toInt
    // hash-derived values: incompressible like real measurements, so the
    // scan exercises real zstd decode work rather than run-length shortcuts
    val df = spark.range(rows).select(
      col("id"),
      (xxhash64(col("id")).cast("double") / 1e12).as("v"),
      (xxhash64(col("id"), lit(1)) % 100000).cast("float").as("f"),
      (xxhash64(col("id"), lit(2)) % 1000000).cast("int").as("k"),
      concat(lit("doc-"), abs(xxhash64(col("id"), lit(3))).cast("string")).as("s"))
    val tWrite = timeBest(1) {
      df.withColumn("idx", col("id"))
        .repartition(nShards, expr(s"floor(idx / $chunkRows)"))
        .sortWithinPartitions("idx")
        .write.format("zarr").option("group", "/t")
        .option("chunk_rows", chunkRows.toString)
        .option("shard_rows", shardRows.toString)
        .option("row_index", "idx")
        .option("compression", compression)
        .mode("overwrite").save(dir)
    }
    val storeBytes = {
      def du(f: java.io.File): Long =
        if (f.isFile) f.length
        else Option(f.listFiles).map(_.map(du).sum).getOrElse(0L)
      du(new java.io.File(dir.stripPrefix("file:")))
    }
    println(s"""{"phase":"write","rows":$rows,"shards":$nShards,"sec":${f(tWrite)},"store_bytes":$storeBytes}""")

    // ---- 3. task count == planned chunk ranges ----
    val planned = read(spark, dir, columnar = true, chunkRows.toLong)
      .queryExecution.toRdd.getNumPartitions
    require(planned == nShards, s"expected $nShards scan tasks, planned $planned")
    println(s"""{"phase":"partitions","planned":$planned,"expected":$nShards}""")

    // ---- 1. row vs columnar, local[32] ----
    def numericScan(d: DataFrame): Unit =
      d.select(sum("id"), sum("v"), sum(col("f").cast("double")), sum("k")).collect()
    def stringScan(d: DataFrame): Unit =
      d.select(max(length(col("s"))), count(lit(1))).collect()

    numericScan(read(spark, dir, columnar = true, chunkRows.toLong)) // warm JIT + page cache
    val tRowNum = timeBest(runs)(numericScan(read(spark, dir, columnar = false, chunkRows.toLong)))
    val tColNum = timeBest(runs)(numericScan(read(spark, dir, columnar = true, chunkRows.toLong)))
    val tRowStr = timeBest(runs)(stringScan(read(spark, dir, columnar = false, chunkRows.toLong)))
    val tColStr = timeBest(runs)(stringScan(read(spark, dir, columnar = true, chunkRows.toLong)))
    println(s"""{"phase":"row_vs_columnar","cpus":32,"numeric_row_sec":${f(tRowNum)},"numeric_columnar_sec":${f(tColNum)},"numeric_speedup":${f(tRowNum / tColNum)},"string_row_sec":${f(tRowStr)},"string_columnar_sec":${f(tColStr)},"string_speedup":${f(tRowStr / tColStr)}}""")

    // ---- 2. columnar scaling across local[N] ----
    spark.stop()
    val curve = Seq(4, 8, 16, 32).map { cpus =>
      spark = session(cpus)
      numericScan(read(spark, dir, columnar = true, chunkRows.toLong)) // warm
      val t = timeBest(runs)(numericScan(read(spark, dir, columnar = true, chunkRows.toLong)))
      spark.stop()
      cpus -> t
    }
    val curveJson = curve.map { case (c, t) => s""""local$c":${f(t)}""" }.mkString(",")
    val t4 = curve.head._2
    val t32 = curve.last._2
    println(s"""{"phase":"scaling",$curveJson,"speedup_4_to_32":${f(t4 / t32)}}""")

    println(s"""{"metric":"scanbench","rows":$rows,"columnar_numeric_speedup":${f(tRowNum / tColNum)},"columnar_string_speedup":${f(tRowStr / tColStr)},"scaling_4_to_32":${f(t4 / t32)},"tasks":$planned}""")
  }

  private def f(d: Double): String = f"$d%.3f"
}
