package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * A/B the ranged shard-read path against whole-object reads on one locally
 * written sharded store: `runMain graft.tools.ShardRangeBench [rows]
 * [chunkRows] [dir]`.
 *
 * Two measurements:
 *  1. FULL scan wall time, whole-GET vs ranged (threshold forced to 0) —
 *     quantifies the open-per-inner-chunk overhead the ranged path pays on
 *     a local filesystem when every inner chunk is touched anyway;
 *  2. pushed-down LIMIT wall time on both paths — the case the ranged path
 *     exists for (transfer the index + one inner chunk, not the shard).
 *
 * Local-FS numbers UNDERSTATE the ranged win: here a whole-object read is a
 * page-cached sequential read, while on an object store it is a
 * gigabyte-scale transfer at wire speed. The overhead side (measurement 1)
 * is the honest cost; the win side (measurement 2) is a lower bound.
 */
object ShardRangeBench {

  import BenchHarness.session
  private def timeBest(runs: Int)(body: => Unit): Double =
    BenchHarness.timeBest(runs, "shardrange")(body)

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 16L * 1024 * 1024
    val chunkRows = if (args.length > 1) args(1).toInt else 1 << 19
    val dir = if (args.length > 2) args(2) else "/tmp/graft_shardrange/store.zarr"
    val shardRows = chunkRows / 8
    val runs = 5
    val spark = session(32)

    val nShards = ((rows + chunkRows - 1) / chunkRows).toInt
    spark.range(rows).select(
        col("id"),
        (xxhash64(col("id")).cast("double") / 1e12).as("v"),
        concat(lit("doc-"), abs(xxhash64(col("id"), lit(3))).cast("string")).as("s"))
      .withColumn("idx", col("id"))
      .repartition(nShards, expr(s"floor(idx / $chunkRows)"))
      .sortWithinPartitions("idx")
      .write.format("zarr").option("group", "/t")
      .option("chunk_rows", chunkRows.toString)
      .option("shard_rows", shardRows.toString)
      .option("row_index", "idx")
      .option("compression", "zstd")
      .mode("overwrite").save(dir)

    def read(): DataFrame = spark.read.format("zarr").option("group", "/t")
      .option("target_partition_rows", chunkRows.toString).load(dir)
    def fullScan(): Unit =
      read().select(sum("id"), sum("v"), max(length(col("s")))).collect()
    def limitScan(): Unit = read().select("id", "v").limit(5).collect()

    def withThreshold[A](t: Long)(body: => A): A = {
      val prev = graft.zarr.ZarrCodecs.rangedShardThresholdBytes
      graft.zarr.ZarrCodecs.rangedShardThresholdBytes = t
      try body finally graft.zarr.ZarrCodecs.rangedShardThresholdBytes = prev
    }

    fullScan() // warm JIT + page cache
    val tFullWhole = withThreshold(Long.MaxValue)(timeBest(runs)(fullScan()))
    val tFullRanged = withThreshold(0L)(timeBest(runs)(fullScan()))
    val tLimitWhole = withThreshold(Long.MaxValue)(timeBest(runs)(limitScan()))
    val tLimitRanged = withThreshold(0L)(timeBest(runs)(limitScan()))
    println(s"""{"metric":"shardrange","rows":$rows,"shards":$nShards,""" +
      s""""inner_per_shard":8,"full_whole_sec":${f(tFullWhole)},""" +
      s""""full_ranged_sec":${f(tFullRanged)},""" +
      s""""full_overhead":${f(tFullRanged / tFullWhole)},""" +
      s""""limit_whole_sec":${f(tLimitWhole)},""" +
      s""""limit_ranged_sec":${f(tLimitRanged)}}""")
  }

  private def f(d: Double): String = f"$d%.3f"
}
