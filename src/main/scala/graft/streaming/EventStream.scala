package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming extension over the `events` stream shape.
 *
 * The reference is strictly bounded (reference: src/table_provider.rs:238-239
 * declares `Boundedness::Bounded`, no watermarks or state anywhere) — this
 * module is the unbounded counterpart a training-data pipeline needs:
 * the same declarative transforms over `readStream`, with watermarked
 * windowed aggregation and custom session state via
 * `flatMapGroupsWithState`.
 *
 * Scale notes: windowed aggregation is a streaming hash aggregate whose
 * state is O(open windows × event types); sessionization keys state by
 * user_id (one shuffle), and event-time timeouts bound state lifetime —
 * both survive an unbounded stream, unlike any collect-based formulation.
 */
object EventStream {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long,
      event_type: String, value: Double)

  case class Session(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long, total_value: Double)

  case class SessionAgg(start: Long, end: Long, n: Long, total: Double)

  /**
   * Tumbling-window counts per event type with a watermark: late events
   * beyond `watermark` are dropped; in append mode a window emits exactly
   * once, when the watermark passes its end.
   */
  def windowedCounts(events: DataFrame, windowLen: String = "10 minutes",
      watermark: String = "10 minutes"): DataFrame =
    events.withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen).as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum("value"), 6).as("total_value"))
      .select(col("w.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  /**
   * Declarative BATCH sessionization with the same gap semantics as the
   * streaming [[sessionize]] (a gap strictly greater than `gapMinutes`
   * closes the session): lag marks session starts, a running sum numbers
   * them, a grouped aggregate collapses them. One shuffle on user_id, all
   * window + hash-agg — the backfill path next to the streaming path, and
   * the oracle-checkable definition the streaming spec is verified against.
   */
  def sessionizeBatch(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gapUs = gapMinutes * 60L * 1000000L
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    events
      .withColumn("prev_us", lag(unix_micros(col("ts")), 1).over(w))
      .withColumn("new_s",
        when(col("prev_us").isNull ||
          unix_micros(col("ts")) - col("prev_us") > gapUs, 1L).otherwise(0L))
      .withColumn("session_idx", sum("new_s")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("user_id", "session_idx")
      .agg(min("ts").as("session_start"), max("ts").as("session_end"),
        count(lit(1)).as("n_events"), round(sum("value"), 6).as("total_value"))
      .orderBy("user_id", "session_idx")
  }

  /** Timestamp → epoch micros (getTime alone is MILLIS — the batch twin
   *  compares unix_micros, and a ms-truncated gap merges sessions the
   *  batch definition splits when timestamps carry sub-ms components). */
  private def usOf(t: Timestamp): Long =
    t.getTime * 1000L + (t.getNanos / 1000) % 1000

  private def tsOf(us: Long): Timestamp = {
    val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /**
   * Gap-based sessionization: a user's session closes after `gapMinutes`
   * of silence. Every session is emitted when the WATERMARK passes
   * (last event + gap) — in-batch gaps close the interval logically, but
   * emission still waits for the watermark, because an out-of-order
   * on-time event may yet merge into it (append mode cannot retract).
   */
  def sessionize(events: Dataset[Event], gapMinutes: Int = 30,
      watermark: String = "10 minutes"): Dataset[Session] = {
    import events.sparkSession.implicits._
    val gapUs = gapMinutes * 60L * 1000000L
    val gapMs = gapMinutes * 60000L
    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[Seq[SessionAgg], Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, it: Iterator[Event], state: GroupState[Seq[SessionAgg]]) =>
          // Interval-merge, not append-into-state: a cross-batch
          // out-of-order event EARLIER than the stored intervals must merge
          // under the same gap rule as sessionizeBatch (or open its own
          // earlier session). State holds ALL intervals not yet provably
          // final; an interval is emitted only once the WATERMARK passes
          // its end + gap — emitting earlier would be wrong, because a
          // later on-time event (ts ≥ watermark, ts − end ≤ gap) could
          // still merge into it and append mode cannot retract. Timestamps
          // compare in MICROS, matching the batch twin's unix_micros.
          val pending0 = state.getOption.getOrElse(Seq.empty).toList
          val merged =
            if (!it.hasNext) pending0
            else {
              val sorted = it.toSeq.sortBy(e => usOf(e.ts))
              val evIvs = sorted.foldLeft(List.empty[SessionAgg]) { (acc, e) =>
                val t = usOf(e.ts)
                acc match {
                  case h :: tl if t - h.end <= gapUs =>
                    SessionAgg(h.start, math.max(h.end, t), h.n + 1, h.total + e.value) :: tl
                  case _ => SessionAgg(t, t, 1, e.value) :: acc
                }
              }.reverse
              val all = (pending0 ++ evIvs).sortBy(_.start)
              all.foldLeft(List.empty[SessionAgg]) { (acc, iv) =>
                acc match {
                  case h :: tl if iv.start - h.end <= gapUs =>
                    SessionAgg(math.min(h.start, iv.start), math.max(h.end, iv.end),
                      h.n + iv.n, h.total + iv.total) :: tl
                  case _ => iv :: acc
                }
              }.reverse
            }
          // FINAL iff no on-time event can reach it: watermark > end + gap
          // (late rows below the watermark never arrive here)
          val wmUs = state.getCurrentWatermarkMs() * 1000L
          val (done, open) = merged.partition(iv => iv.end + gapUs < wmUs)
          if (open.isEmpty) state.remove()
          else {
            state.update(open)
            // earliest pending finalization; +1 ms so the event-time
            // timeout lands strictly past end+gap (and past the watermark)
            state.setTimeoutTimestamp(open.map(_.end).min / 1000L + gapMs + 1)
          }
          done.sortBy(_.start).map(a =>
            Session(user, tsOf(a.start), tsOf(a.end), a.n, a.total)).iterator
      }
  }
}
