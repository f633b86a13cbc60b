package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/**
 * One verifiable capability: a named Spark query over the driver test tables
 * plus (where SQL-expressible) an equivalent DuckDB oracle statement.
 *
 * Determinism contract (FIXTURES.md §3): every query ORDER BYs a unique key,
 * aggregation-order-sensitive float results are rounded identically on both
 * sides, and ORDER BY on nullable keys pins NULLS FIRST/LAST explicitly
 * (Spark defaults NULLS FIRST on ASC, DuckDB defaults NULLS LAST).
 */
final case class Q(
    name: String,
    oracle: Option[String],
    fn: (SparkSession, String) => DataFrame)

object Tables {
  /**
   * events.parquet stores `ts` as INT64 TIMESTAMP(NANOS), which the Spark
   * parquet reader rejects outright (PARQUET_TYPE_ILLEGAL). Read nanos as
   * plain longs and rebuild a micros timestamp with integer division — the
   * generator emits microsecond-precision values, so this is lossless and
   * bit-identical to what DuckDB (which reads nanos natively) computes.
   */
  def t(spark: SparkSession, dir: String, name: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.expr("timestamp_micros(ts div 1000)"))
    else df
  }

  val names = Seq("region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Register all test tables as temp views (for spark.sql-based queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => t(spark, dir, n).createOrReplaceTempView(n))
}
