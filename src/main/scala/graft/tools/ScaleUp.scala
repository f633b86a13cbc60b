package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Synthesize an sf-N dataset from the driver's sf0.1 tables by key-shifted
 * replication: `runMain graft.tools.ScaleUp [factor] [srcDir] [dstDir]`
 * (default 10× → ~6M-row lineitem ≈ sf1, written to /tmp).
 *
 * TPC-H-style scaling: fact/dimension KEYS shift per replica so join
 * fan-out stays constant (un-shifted keys would square the matches);
 * region/nation stay fixed (they are constant-size dimensions at every SF).
 * Document text gets a per-replica suffix (distinct shingles/fingerprints —
 * otherwise every doc would have `factor` exact clones and the dedup
 * queries would measure a degenerate corpus); n_chars is recomputed.
 * Embedding vectors replicate as-is (vec_id shifts; LSH bucket caps bound
 * the identical-vector fan-out, same as production near-dup corpora).
 *
 * Bench-only data (SCALE.md's whole-suite sf1 run): correctness stays
 * pinned to the driver's sf0.01 + DuckDB oracle.
 */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val factor = if (args.length > 0) args(0).toInt else 10
    val src = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val dst = if (args.length > 2) args(2) else "/tmp/graft_sf1"
    val spark = BenchHarness.session(32)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def read(name: String): DataFrame = spark.read.parquet(s"$src/$name.parquet")
    def keyStride(df: DataFrame, key: String): Long =
      df.agg(max(col(key))).collect()(0).getLong(0) + 1

    val kCust = keyStride(read("customer"), "c_custkey")
    val kSupp = keyStride(read("supplier"), "s_suppkey")
    val kPart = keyStride(read("part"), "p_partkey")
    val kOrd = keyStride(read("orders"), "o_orderkey")
    val kEvent = keyStride(read("events"), "event_id")
    val kUser = keyStride(read("events"), "user_id")
    val kDoc = keyStride(read("documents"), "doc_id")
    val kVec = keyStride(read("embeddings"), "vec_id")

    /** `factor` key-shifted replicas of `df`. */
    def replicate(name: String, shifts: Map[String, Long],
        mutate: (DataFrame, Int) => DataFrame = (d, _) => d): Unit = {
      val df = read(name)
      val out = (0 until factor).map { i =>
        val shifted = shifts.foldLeft(df) { case (d, (k, stride)) =>
          d.withColumn(k, col(k) + lit(stride * i))
        }
        mutate(shifted, i)
      }.reduce(_ unionAll _)
      out.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      // count the WRITTEN parquet: counting `out` would re-run the whole
      // read-shift-union pipeline a second time just for the log line
      val n = spark.read.parquet(s"$dst/$name.parquet").count()
      println(s"[scaleup] $name -> $n rows")
    }

    // constant-size dimensions: copy once
    Seq("region", "nation").foreach { n =>
      read(n).write.mode("overwrite").parquet(s"$dst/$n.parquet")
      println(s"[scaleup] $n -> copied")
    }
    replicate("customer", Map("c_custkey" -> kCust))
    replicate("supplier", Map("s_suppkey" -> kSupp))
    replicate("part", Map("p_partkey" -> kPart))
    replicate("orders", Map("o_orderkey" -> kOrd, "o_custkey" -> kCust))
    replicate("lineitem", Map("l_orderkey" -> kOrd, "l_partkey" -> kPart,
      "l_suppkey" -> kSupp))
    replicate("events", Map("event_id" -> kEvent, "user_id" -> kUser))
    replicate("documents", Map("doc_id" -> kDoc), (d, i) =>
      if (i == 0) d
      else d.withColumn("text", concat(col("text"), lit(s" rep$i")))
        .withColumn("n_chars", length(col("text"))))
    replicate("embeddings", Map("vec_id" -> kVec))
    println(s"[scaleup] done: $dst at ${factor}x of $src")
  }
}
