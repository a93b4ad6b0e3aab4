package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming analytics over an event stream — the two canonical
  * stateful shapes (builder-prompt §streaming; no reference counterpart,
  * SURVEY §2.12):
  *
  *   - watermarked tumbling-window aggregation (late events beyond the
  *     watermark are dropped, state is bounded);
  *   - sessionization via `flatMapGroupsWithState` with a processing-time
  *     timeout — per-user session windows with custom gap logic, the
  *     KeyValueGroupedDataset state machine the reference's per-user lock
  *     maps onto at streaming scale.
  */
object StreamingStats {

  /** Tumbling-window counts per event type with a watermark. Input must
    * have (ts timestamp, event_type string, value double); output one
    * row per closed (window, event_type) with count + value sum.
    */
  def windowedCounts(
      events: DataFrame,
      windowLen: String = "10 minutes",
      watermark: String = "5 minutes"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
      .select(
        col("window.start").as("window_start"),
        col("event_type"), col("n"), col("sum_value"))

  final case class SessionEvent(user_id: Long, ts_ms: Long, event_type: String)
  final case class SessionState(start: Long, last: Long, n: Long)
  final case class SessionOut(user_id: Long, start: Long, end: Long, n_events: Long)

  /** Sessionize per user with a gap: events closer than `gapMs` extend
    * the session; a later event past the gap closes it and emits one
    * SessionOut row. State per user is O(1). NoTimeout keeps the
    * micro-batch engine idle between arrivals (a ProcessingTimeTimeout
    * variant would also flush idle sessions, at the cost of continuous
    * timeout batches — wire it only behind a real trigger interval).
    */
  def sessionize(
      events: Dataset[SessionEvent],
      gapMs: Long
  ): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (user: Long, batch: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption
          batch.toSeq.sortBy(e => (e.ts_ms, e.event_type)).foreach { e =>
            cur match {
              case Some(s) if e.ts_ms - s.last <= gapMs =>
                // max(): a late cross-batch event must not rewind `last`
                // (no watermark on this path, so disorder is normal) —
                // otherwise the next on-time event falsely exceeds the gap
                cur = Some(s.copy(last = math.max(s.last, e.ts_ms), n = s.n + 1))
              case Some(s) =>
                out += SessionOut(user, s.start, s.last, s.n) // gap exceeded
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
              case None =>
                cur = Some(SessionState(e.ts_ms, e.ts_ms, 1))
            }
          }
          cur.foreach(state.update)
          out.iterator
      }
  }
}
