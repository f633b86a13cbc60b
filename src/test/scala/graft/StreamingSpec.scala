package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.{col, expr}

import graft.streaming.EventStream
import graft.streaming.EventStream.Event

/**
 * Drives the streaming operators through real micro-batches (MemoryStream →
 * memory sink), verifying watermark semantics: append-mode windows emit only
 * once the watermark passes, and sessions close via event-time timeout.
 */
class StreamingSpec extends SparkSpec {

  private def ts(minutes: Int): Timestamp = new Timestamp(minutes * 60000L)

  test("watermarked tumbling windows emit once the watermark passes") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.windowedCounts(mem.toDF())
      .writeStream.format("memory").queryName("wc").outputMode("append").start()
    try {
      // two windows' worth of events: [0,10) and [10,20)
      mem.addData(
        Event(1, ts(1), 10, "click", 1.0),
        Event(2, ts(5), 10, "click", 2.0),
        Event(3, ts(12), 11, "view", 4.0))
      q.processAllAvailable()
      // watermark = max(ts) - 10min = 2min → no window closed yet
      assert(spark.table("wc").count() == 0)
      // an event at t=35 advances the watermark to 25 → both windows close
      mem.addData(Event(4, ts(35), 12, "click", 8.0))
      q.processAllAvailable()
      val rows = spark.table("wc").orderBy("window_start", "event_type").collect()
      assert(rows.map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2), r.getDouble(3))).toSeq ==
        Seq((0L, "click", 2L, 3.0), (10L, "view", 1L, 4.0)))
      // late event for the closed [0,10) window is dropped, not re-emitted
      mem.addData(Event(5, ts(2), 10, "click", 99.0))
      q.processAllAvailable()
      assert(spark.table("wc").count() == 2)
    } finally q.stop()
  }

  test("sessionization: sessions emit only when the watermark finalizes them") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30)
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      // user 1: two bursts 100 min apart in ONE batch. The first interval
      // closes LOGICALLY in-batch but must NOT emit yet: the watermark is
      // still behind its end+gap, so an on-time out-of-order event could
      // still merge into it (round 9 — emitting early produced
      // split/contradictory sessions vs the batch definition). NOTE events
      // start at t=1min: a first-batch event at exactly t=0 is filtered as
      // late (ts <= initial watermark 0).
      mem.addData(
        Event(1, ts(1), 1, "click", 1.0),
        Event(2, ts(10), 1, "click", 1.0),
        Event(3, ts(110), 1, "view", 2.0),
        Event(4, ts(115), 2, "click", 5.0))
      q.processAllAvailable()
      // the drain advances the watermark to 105 (115 − 10) and fires the
      // finalization: [1,10] (end+gap 40 < 105) emits; [110] and [115]
      // (end+gap ≥ 140) stay open
      val first = spark.table("sessions").collect()
      assert(first.length == 1, s"rows=${first.map(_.toSeq).toList}")
      assert(first.head.getLong(0) == 1L && first.head.getLong(3) == 2L,
        s"rows=${first.map(_.toSeq).toList}")
      // watermark → 290 (300-10): finalizes every interval ending ≤ 260;
      // the emission happens on the NEXT batch after the watermark update
      mem.addData(Event(5, ts(300), 3, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(6, ts(400), 3, "click", 0.0))
      q.processAllAvailable()
      val all = spark.table("sessions").collect()
        .map(r => (r.getLong(0), r.getTimestamp(1).getTime / 60000, r.getLong(3), r.getDouble(4)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(all.contains((1L, 1L, 2L, 2.0)), s"in-batch closed session: $all")
      assert(all.contains((1L, 110L, 1L, 2.0)), s"user1 second session via timeout: $all")
      assert(all.contains((2L, 115L, 1L, 5.0)), s"user2 session via timeout: $all")
    } finally q.stop()
  }

  test("stream-stream join: watermarked interval join matches within the bound") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // clicks join impressions within [0, 10 min] after the impression —
    // two-sided state, bounded by both watermarks + the interval condition
    val imps = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]
    val impDf = imps.toDF().toDF("ad_id", "imp_ts").withWatermark("imp_ts", "10 minutes")
    val clickDf = clicks.toDF().toDF("c_ad_id", "click_ts").withWatermark("click_ts", "10 minutes")
    val joined = impDf.join(clickDf,
      expr("""c_ad_id = ad_id AND
              click_ts >= imp_ts AND
              click_ts <= imp_ts + interval 10 minutes"""))
    val q = joined.writeStream.format("memory").queryName("ss_join")
      .outputMode("append").start()
    try {
      imps.addData((1L, ts(1)), (2L, ts(2)), (3L, ts(3)))
      clicks.addData(
        (1L, ts(5)),   // within 10 min of imp 1 → match
        (2L, ts(20)),  // 18 min after imp 2 → outside interval, no match
        (3L, ts(3)))   // same minute → match
      q.processAllAvailable()
      val rows = spark.table("ss_join")
        .select("ad_id", "imp_ts", "click_ts").collect()
        .map(r => (r.getLong(0), r.getTimestamp(2).getTime / 60000)).sorted.toSeq
      assert(rows == Seq((1L, 5L), (3L, 3L)), s"got $rows")
    } finally q.stop()
  }

  test("streaming exact dedup: first copy passes, dups drop, state expires with the watermark") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    case class Doc(doc_id: Long, ts: Timestamp, text: String)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val stream = mem.toDF().toDF("doc_id", "ts", "text")
    val q = graft.operators.Dedup.exactDedupStream(stream, delay = "10 minutes")
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try {
      // batch 1: two copies of A in one batch + one B → A once, B once
      mem.addData((1L, ts(1), "doc A"), (2L, ts(2), "doc A"), (3L, ts(3), "doc B"))
      q.processAllAvailable()
      // batch 2: another copy of A within the watermark window → dropped
      mem.addData((4L, ts(5), "doc A"))
      q.processAllAvailable()
      val early = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
      assert(early == Seq(1L, 3L), s"got $early")
      // advance the watermark far past A's state expiry, then replay A:
      // bounded state means the very-late copy is re-admitted (documented
      // trade-off — downstream batch dedup owns the long tail)
      mem.addData((5L, ts(100), "doc C"))
      q.processAllAvailable()
      mem.addData((6L, ts(101), "doc A"))
      q.processAllAvailable()
      val late = spark.table("dedup_stream").collect().map(_.getLong(0)).sorted.toSeq
      assert(late == Seq(1L, 3L, 5L, 6L), s"got $late")
    } finally q.stop()
  }

  test("streaming minhash near-dup: candidates match the batch operator, arrival-order free") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    // planted corpus: 3 near-dup pairs (one-word edits) among distinct docs
    def doc(seed: Int): String =
      (0 until 40).map(w => s"tok${(seed * 31 + w * 7) % 997}_$w").mkString(" ")
    val base = (0L until 20L).map(i => (i, doc(i.toInt)))
    val copies = Seq(
      (100L, doc(3).replace("_5", "_x")),   // near-dup of 3
      (101L, doc(7).replace("_11", "_y")),  // near-dup of 7
      (102L, doc(12)))                      // exact dup of 12
    val corpus = base ++ copies
    val batchPairs = graft.operators.Dedup.minhashCandidates(
        corpus.toDF("doc_id", "text"), "text", "doc_id")
      .filter(col("est_jaccard") >= 0.5)
      .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchPairs == Set((3L, 100L), (7L, 101L), (12L, 102L)))
    val mem = MemoryStream[(Long, String)]
    val q = graft.operators.Dedup.streamingNearDupCandidates(
        mem.toDF().toDF("doc_id", "text"))
      .writeStream.format("memory").queryName("nearDup").outputMode("append").start()
    try {
      // copies arrive SPLIT across micro-batches, before and after originals
      mem.addData(corpus.take(10) :+ copies(2): _*)
      q.processAllAvailable()
      mem.addData(corpus.slice(10, 20) ++ copies.take(2): _*)
      q.processAllAvailable()
      val streamed = spark.table("nearDup")
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(streamed == batchPairs) // per-band re-emits collapse in the Set
      val ests = spark.table("nearDup").filter(col("id_a") === 12)
        .select("est_jaccard").collect().map(_.getDouble(0))
      assert(ests.forall(_ == 1.0)) // exact copy agrees on every minhash
    } finally q.stop()
  }

  test("zarr micro-batch stream picks up appended rows across triggers") {
    val dir = tempDir("zarr_stream")
    graft.zarr.ZarrWriter.writeGroup(dir, "/g")
    graft.zarr.ZarrWriter.writeLongArray(dir, "/g", "x", Seq(0L, 1L, 2L, 3L), chunkLen = 2)
    val stream = spark.readStream.format("zarr").option("group", "/g").load(dir)
    val q = stream.writeStream.format("memory").queryName("zstream")
      .outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("zstream").collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1L, 2L, 3L))
      // grow the store: same chunk grid, larger shape (whole-chunk append)
      graft.zarr.ZarrWriter.writeLongArray(dir, "/g", "x", 0L until 8L, chunkLen = 2)
      q.processAllAvailable()
      // only the NEW rows [4, 8) arrive in the next micro-batch
      assert(spark.table("zstream").collect().map(_.getLong(0)).sorted.toSeq ==
        (0L until 8L).toSeq)
    } finally q.stop()
  }

  test("end-to-end: zarr stream feeds the watermarked windowed aggregation") {
    // the two streaming extensions composed: a growing Zarr store on one
    // end, watermark+window semantics on the other
    val dir = tempDir("zarr_stream_agg")
    def writeStore(upTo: Int): Unit = {
      graft.zarr.ZarrWriter.writeGroup(dir, "/g")
      graft.zarr.ZarrWriter.writeLongArray(dir, "/g", "ts",
        (0 until upTo).map(i => (i + 1) * 60000L), chunkLen = 4,
        datetimeUnit = Some("ms"))
      graft.zarr.ZarrWriter.writeStringArray(dir, "/g", "event_type",
        (0 until upTo).map(i => if (i % 2 == 0) "click" else "view"), chunkLen = 4)
      graft.zarr.ZarrWriter.writeDoubleArray(dir, "/g", "value",
        (0 until upTo).map(_.toDouble), chunkLen = 4)
    }
    writeStore(8) // events at minutes 1..8
    val stream = spark.readStream.format("zarr").option("group", "/g").load(dir)
      .withColumn("ts", col("ts").cast("timestamp")) // windowedCounts expects TIMESTAMP
    val q = graft.streaming.EventStream.windowedCounts(stream)
      .writeStream.format("memory").queryName("zwagg").outputMode("append").start()
    try {
      q.processAllAvailable()
      assert(spark.table("zwagg").count() == 0) // watermark hasn't passed window ends
      writeStore(40) // grow to minute 40 → watermark 30 → windows [0,10),[10,20) close
      q.processAllAvailable()
      val rows = spark.table("zwagg").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2)))
        .sortBy(t => (t._1, t._2)).toSeq
      // window [0,10): events 1..9 → 5 clicks (even i → minutes 1,3,5,7,9) + 4 views
      assert(rows.nonEmpty && rows.forall(_._1 < 30), s"rows=$rows")
      assert(rows.map(_._3).sum == 29, s"29 events in closed windows: $rows")
    } finally q.stop()
  }

  test("the batch events table runs through the same windowed aggregation") {
    // the streaming transform is batch-compatible: same code, bounded input
    val batch = graft.queries.Tables.t(spark, sf, "events")
    val out = EventStream.windowedCounts(batch).collect()
    assert(out.nonEmpty)
  }

  test("sessionization: an in-batch-closed interval is NOT emitted while an " +
      "on-time out-of-order event can still merge into it") {
    // round 9 regression: with the watermark delay WIDER than the gap, an
    // interval whose in-batch successor is > gap away is logically closed
    // but not FINAL — a later on-time event between them can merge the two.
    // The old early-emission produced a [100,100] session AND a merged
    // [100,135] session (contradictory, append cannot retract).
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30, watermark = "120 minutes")
      .writeStream.format("memory").queryName("late_merge_sessions")
      .outputMode("append").start()
    try {
      // one batch, gap 35 > 30 between the two events → two open intervals;
      // watermark after the batch is 15 (135 − 120): neither is final
      mem.addData(Event(1, ts(100), 1, "click", 1.0), Event(2, ts(135), 1, "view", 2.0))
      q.processAllAvailable()
      assert(spark.table("late_merge_sessions").collect().isEmpty,
        "no interval may emit while the watermark is behind its end+gap")
      // on-time out-of-order bridge event: within gap of BOTH intervals
      mem.addData(Event(3, ts(128), 1, "view", 4.0))
      q.processAllAvailable()
      // sentinels push the watermark past everything
      mem.addData(Event(90, ts(500), 99, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(91, ts(900), 99, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("late_merge_sessions")
      .filter(org.apache.spark.sql.functions.col("user_id") === 1)
      .collect().map(r => (r.getTimestamp(1).getTime / 60000,
        r.getTimestamp(2).getTime / 60000, r.getLong(3), r.getDouble(4))).toSeq
    // ONE merged session 100-135 with all three events — same as the batch
    // definition over the full event set
    assert(got == Seq((100L, 135L, 3L, 7.0)), got.toString)
  }

  test("sessionization: cross-batch OUT-OF-ORDER events merge like the batch oracle") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val mem = MemoryStream[Event]
    // watermark wider than the gap: with delay <= gap, an event more than a
    // gap earlier than an open session is always late-dropped before the
    // operator — the out-of-order path needs delay > gap to be reachable
    val q = EventStream.sessionize(mem.toDS(), gapMinutes = 30, watermark = "120 minutes")
      .writeStream.format("memory").queryName("ooo_sessions").outputMode("append").start()
    try {
      // batch 1: user 1 at min 100; user 2 far ahead keeps sessions open
      mem.addData(Event(1, ts(100), 1, "click", 1.0), Event(2, ts(101), 2, "click", 0.0))
      q.processAllAvailable()
      // batch 2, OUT OF ORDER but above the 120-min watermark: user 1 at
      // min 90 (within gap → must merge AND lower session_start) and at
      // min 20 (beyond gap → its own EARLIER session, not a force-merge)
      mem.addData(Event(3, ts(90), 1, "view", 2.0), Event(4, ts(20), 1, "view", 4.0))
      q.processAllAvailable()
      // sentinel advances the watermark so every session times out
      mem.addData(Event(90, ts(500), 99, "click", 0.0))
      q.processAllAvailable()
      mem.addData(Event(91, ts(900), 99, "click", 0.0))
      q.processAllAvailable()
    } finally q.stop()
    val streamed = spark.table("ooo_sessions")
      .filter(org.apache.spark.sql.functions.col("user_id") === 1)
      .select("session_start", "session_end", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    // the batch oracle over the same events
    val events = Seq(
      Event(1, ts(100), 1, "click", 1.0), Event(3, ts(90), 1, "view", 2.0),
      Event(4, ts(20), 1, "view", 4.0))
    val batch = EventStream.sessionizeBatch(events.toDS().toDF(), gapMinutes = 30)
      .select("session_start", "session_end", "n_events", "total_value")
      .collect().map(_.toSeq).toSet
    assert(streamed == batch, s"streamed=$streamed batch=$batch")
    assert(batch.size == 2) // [20,20] and [90,100] — start lowered to 90
  }
}
