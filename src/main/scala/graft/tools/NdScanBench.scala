package graft.tools

import org.apache.spark.sql.functions._

/**
 * A/B the n-D (nested-ArrayType) scan through the columnar vs row readers:
 * `runMain graft.tools.NdScanBench [rows] [dim]` — default 4M rows × 64
 * float32 (a typical embedding matrix), written once through the DSv2 sink
 * (2-D store, trailing dim unchunked → the contiguous fast path), then a
 * representative probe (array size + first/last element sums) measured
 * best-of-5 through both readers.
 */
object NdScanBench {

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 4L * 1024 * 1024
    val dim = if (args.length > 1) args(1).toInt else 64
    val dir = s"/tmp/graft_ndscan/store_${rows}_$dim.zarr"
    val spark = BenchHarness.session(32)

    if (!new java.io.File(s"$dir/t/emb/zarr.json").exists()) {
      val chunkRows = 1 << 18
      val nChunks = ((rows + chunkRows - 1) / chunkRows).toInt
      spark.range(rows).select(
          col("id"),
          expr(s"transform(sequence(1, $dim), j -> cast(pmod(id * j, 997) as float))")
            .as("emb"))
        .withColumn("idx", col("id"))
        .repartition(nChunks, expr(s"floor(idx / $chunkRows)"))
        .sortWithinPartitions("idx")
        .write.format("zarr").option("group", "/t")
        .option("chunk_rows", chunkRows.toString)
        .option("row_index", "idx")
        .mode("overwrite").save(dir)
    }

    def scan(columnar: Boolean): Unit =
      spark.read.format("zarr").option("group", "/t")
        .option("columnar", columnar.toString).load(dir)
        .agg(sum(size(col("emb"))),
          sum(element_at(col("emb"), 1).cast("double")),
          sum(element_at(col("emb"), dim).cast("double")))
        .collect()

    scan(columnar = true) // warm JIT + page cache
    val tCol = BenchHarness.timeBest(5, "nd-columnar")(scan(columnar = true))
    val tRow = BenchHarness.timeBest(5, "nd-row")(scan(columnar = false))
    println(f"""{"metric":"ndscan","rows":$rows,"dim":$dim,""" +
      f""""columnar_sec":$tCol%.3f,"row_sec":$tRow%.3f,""" +
      f""""speedup":${tRow / tCol}%.2f}""")
  }
}
