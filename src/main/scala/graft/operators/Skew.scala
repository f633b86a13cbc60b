package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-mitigation patterns for hot grouping keys — at 100 TB a handful of
 * degenerate keys (empty strings, null-ish sentinels, bot users) can hold
 * one reducer hostage while every other partition finishes.
 *
 * Salted two-phase aggregation: append a random-but-deterministic salt to
 * the key, partially aggregate (`groupBy(key, salt)` spreads a hot key over
 * `buckets` reducers), then merge the partials per key. Works for any
 * algebraic aggregate (sum/count/min/max and compositions like avg =
 * sum/count). AQE's skew-join handling covers joins at runtime; this covers
 * aggregation, which AQE does not re-balance.
 */
object Skew {

  /** Deterministic per-row salt in [0, buckets): cheap, no RNG state. */
  private def salt(buckets: Int, on: Column): Column =
    pmod(xxhash64(on), lit(buckets))

  /**
   * groupBy(key).agg(sum, count) with a salt stage. `saltOn` should be a
   * high-cardinality column (a row id); the hot key's rows spread over
   * `buckets` partial groups, so no single reducer sees the full hot key.
   */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      saltOn: String, buckets: Int = 16): DataFrame =
    df.groupBy(col(key), salt(buckets, col(saltOn)).as("_salt"))
      .agg(sum(valueCol).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(key))
      .agg(sum("_psum").as("total"), sum("_pcnt").as("n"))

  /**
   * Skew-safe equi-join: the big (skewed) side gets a deterministic salt in
   * [0, buckets) from a high-cardinality column, the small side is
   * replicated once per salt value (`explode(sequence(...))` — a `buckets`×
   * blow-up of the SMALL side only), and the join runs on (key, salt). A hot
   * key's rows land on `buckets` different reducers instead of one. The
   * result set is exactly the plain join's — salting only changes placement.
   * Complements AQE skew handling: AQE can only split a skewed SMJ partition
   * after materialization; pre-salting also covers the hash-agg-after-join
   * and works when AQE is off.
   */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String,
      saltOn: String, buckets: Int = 8): DataFrame = {
    val saltedBig = big.withColumn("_salt", salt(buckets, col(saltOn)))
    val replicatedSmall = small.withColumn("_salt",
      explode(sequence(lit(0L), lit(buckets - 1L))))
    saltedBig.join(replicatedSmall, Seq(key, "_salt")).drop("_salt")
  }
}
