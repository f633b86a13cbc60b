package graft.operators

import org.apache.spark.sql.functions._

/** Equivalence tests for the sorted run-length LSH bucket machinery
  * (Dedup.cappedRunPairs / Dedup.cappedRuns) against the window/groupBy
  * formulations they replace — same pair/prune sets on skewed synthetic
  * data including an over-cap degenerate bucket, singleton buckets and a
  * flagged (incremental) restriction. */
class CappedRunsSpec extends graft.SparkSpec {
  import spark.implicits._

  private val maxBucket = 5

  // (band, bucket, id): bucket 100 degenerate (maxBucket+3 members),
  // bucket 200 exactly at cap, bucket 300 a pair, bucket 400 singleton,
  // bucket 500 triple seen under two bands, plus a duplicated id in 600
  private def banded = Seq(
    (0, 100L, "a"), (0, 100L, "b"), (0, 100L, "c"), (0, 100L, "d"),
    (0, 100L, "e"), (0, 100L, "f"), (0, 100L, "g"), (0, 100L, "h"),
    (0, 200L, "p1"), (0, 200L, "p2"), (0, 200L, "p3"), (0, 200L, "p4"), (0, 200L, "p5"),
    (1, 300L, "x"), (1, 300L, "y"),
    (1, 400L, "solo"),
    (0, 500L, "m"), (0, 500L, "n"), (0, 500L, "o"),
    (1, 500L, "m"), (1, 500L, "n"), (1, 500L, "o"),
    (1, 600L, "dup"), (1, 600L, "dup"), (1, 600L, "other")
  ).toDF("band", "bucket", "id").repartition(7) // scattered input partitions

  private def referencePairs(flagIds: Option[Seq[String]]) = {
    val ok = banded.groupBy("band", "bucket").agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= 2 && col("_n") <= maxBucket).select("band", "bucket")
    val pruned = banded.join(ok, Seq("band", "bucket"))
    val raw = flagIds match {
      case None =>
        pruned.select(col("band"), col("bucket"), col("id").as("id_a"))
          .join(pruned.select(col("band"), col("bucket"), col("id").as("id_b")),
            Seq("band", "bucket"))
          .filter(col("id_a") < col("id_b")).select("id_a", "id_b")
      case Some(ids) =>
        val newSigs = pruned.join(ids.toDF("id"), Seq("id"), "left_semi")
        pruned.select(col("band"), col("bucket"), col("id").as("id_a"))
          .join(newSigs.select(col("band"), col("bucket"), col("id").as("id_b")),
            Seq("band", "bucket"))
          .filter(col("id_a") =!= col("id_b"))
          .select(least(col("id_a"), col("id_b")).as("id_a"),
            greatest(col("id_a"), col("id_b")).as("id_b"))
    }
    raw.distinct().orderBy("id_a", "id_b").collect().map(r => (r.getString(0), r.getString(1))).toSeq
  }

  test("cappedRunPairs ≡ groupBy+self-join formulation (full mode)") {
    val got = Dedup.cappedRunPairs(banded, Seq("band", "bucket"), "id", maxBucket)
      .orderBy("id_a", "id_b").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = referencePairs(None)
    assert(want.nonEmpty) // the fixture must actually exercise pair emission
    assert(got == want)
    // degenerate bucket contributes nothing; at-cap bucket contributes all pairs
    assert(!got.exists(p => p._1 == "a" || p._2 == "a"))
    assert(got.count(p => p._1.startsWith("p")) == 10) // C(5,2)
  }

  test("cappedRunPairs flag mode ≡ semi-join-restricted formulation") {
    val ids = Seq("x", "m", "absent")
    val flagged = banded.join(
      ids.toDF("id").distinct().withColumn("_new", lit(true)), Seq("id"), "left")
    val got = Dedup.cappedRunPairs(flagged, Seq("band", "bucket"), "id", maxBucket,
        flagCol = Some("_new"))
      .orderBy("id_a", "id_b").collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val want = referencePairs(Some(ids))
    assert(want.nonEmpty)
    assert(got == want)
  }

  test("cappedRuns ≡ window-count cap (minRun 1), keeps all columns") {
    val want = banded
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("_n") <= maxBucket).drop("_n")
      .orderBy("band", "bucket", "id").collect().map(_.toSeq).toSeq
    val got = Dedup.cappedRuns(banded, Seq("band", "bucket"), maxBucket)
      .orderBy("band", "bucket", "id").collect().map(_.toSeq).toSeq
    assert(got == want)
    assert(got.nonEmpty)
    // the degenerate bucket is gone, the at-cap bucket survives intact
    assert(!got.exists(_.contains("a")))
    assert(got.count(_.contains(0)) >= 5)
  }

  test("cappedRunPairs on an empty frame") {
    val empty = banded.filter(lit(false))
    assert(Dedup.cappedRunPairs(empty, Seq("band", "bucket"), "id", maxBucket).count() == 0)
    assert(Dedup.cappedRuns(empty, Seq("band", "bucket"), maxBucket).count() == 0)
  }
}
