package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew
import graft.queries.Tables

/**
 * SURVEY §2 C-scan rows beyond parquet: CSV and JSON scans usable alongside
 * the custom Zarr source in one session (the reference registers its
 * provider into a stock SessionContext next to DataFusion's file sources).
 * Plus the skew-mitigation aggregation pattern.
 */
class SourcesSpec extends SparkSpec {

  test("CSV and JSON roundtrip the events sample with identical rows") {
    val events = Tables.t(spark, sf, "events")
      .select("event_id", "user_id", "event_type", "value")
      .orderBy("event_id").limit(200)
    val dir = tempDir("fmt")
    events.write.option("header", "true").csv(s"$dir/csv")
    events.write.json(s"$dir/json")
    val fromCsv = spark.read.option("header", "true").option("inferSchema", "true")
      .csv(s"$dir/csv").orderBy("event_id")
    val fromJson = spark.read.json(s"$dir/json")
      .select("event_id", "user_id", "event_type", "value").orderBy("event_id")
    val want = events.collect().map(_.toSeq).toSeq
    assert(fromCsv.collect().map(_.toSeq).toSeq == want)
    assert(fromJson.collect().map(_.toSeq).toSeq == want)
  }

  test("salted two-phase aggregation equals direct groupBy (hot-key safe)") {
    // build a skewed frame: one key holds ~90% of rows
    val skewed = Tables.t(spark, sf, "lineitem")
      .select(when(col("l_orderkey") % 10 =!= 0, lit("HOT"))
        .otherwise(col("l_orderkey").cast("string")).as("k"),
        col("l_quantity").as("v"), col("l_orderkey").as("rid"))
    val direct = skewed.groupBy("k")
      .agg(sum("v").as("total"), count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, "k", "v", "rid", buckets = 8)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted == direct)
    // and the salted plan really has two aggregation exchanges
    val plan = Skew.saltedSumCount(skewed, "k", "v", "rid", 8)
      .queryExecution.executedPlan.toString
    assert(plan.contains("_salt") || plan.contains("hashpartitioning"), plan.take(500))
  }

  test("salted join equals the plain join and spreads the hot key") {
    import spark.implicits._
    // 1000 rows of one hot key + a long tail; small dim side of 11 keys
    val big = spark.range(1200).select(
      when(col("id") < 1000, lit(0L)).otherwise(col("id") % 10 + 1).as("k"),
      col("id").as("rid"))
    val small = (0L to 10L).map(k => (k, s"dim_$k")).toDF("k", "name")
    val direct = big.join(small, "k").select("k", "rid", "name")
      .collect().map(_.toSeq).toSet
    val salted = Skew.saltedJoin(big, small, "k", saltOn = "rid", buckets = 8)
      .select("k", "rid", "name").collect().map(_.toSeq).toSet
    assert(salted == direct && direct.size == 1200)
    // the hot key's rows really occupy several (key, salt) groups
    val spread = big.filter(col("k") === 0L)
      .select(org.apache.spark.sql.functions.pmod(xxhash64(col("rid")), lit(8)).as("s"))
      .distinct().count()
    assert(spread == 8L)
  }
}
