package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.queries.Tables

/** Pins the events.ts drift tolerance: the driver's generator has shipped
 *  `ts` as INT64 TIMESTAMP(NANOS) (rounds ≤8) and as naive TIMESTAMP(MICROS)
 *  (round 9's regen — which made every events/registerAll query fail fast at
 *  plan time until normalization dispatched on the landed schema). All three
 *  arrival encodings must normalize to the same TimestampType instants.
 */
class TablesSpec extends SparkSpec {

  private val micros = 1700000000123456L // 2023-11-14T22:13:20.123456Z

  private def tsOf(df: org.apache.spark.sql.DataFrame): (DataType, Long) = {
    val out = Tables.normalizeEventsTs(df)
    val inst = out.select(unix_micros(col("ts"))).collect()(0).getLong(0)
    (out.schema("ts").dataType, inst)
  }

  test("nanos-as-long ts rebuilds the same micros instant") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, micros * 1000L)),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", LongType))))
    assert(tsOf(df) === (TimestampType, micros))
  }

  test("TIMESTAMP_NTZ ts casts to the same micros instant under the UTC session") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, java.time.LocalDateTime.ofEpochSecond(
        micros / 1000000L, (micros % 1000000L).toInt * 1000, java.time.ZoneOffset.UTC))),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampNTZType))))
    assert(tsOf(df) === (TimestampType, micros))
  }

  test("TimestampType ts passes through untouched") {
    val df = spark.createDataFrame(
      java.util.List.of(Row(1L, java.sql.Timestamp.from(
        java.time.Instant.EPOCH.plus(micros, java.time.temporal.ChronoUnit.MICROS)))),
      StructType(Seq(StructField("event_id", LongType), StructField("ts", TimestampType))))
    assert(tsOf(df) === (TimestampType, micros))
  }

  test("the live testdata events table lands as TimestampType for every sf") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val df = Tables.t(spark, dir, "events")
      assert(df.schema("ts").dataType === TimestampType, dir)
      assert(df.limit(1).count() === 1, dir)
    }
  }
}
