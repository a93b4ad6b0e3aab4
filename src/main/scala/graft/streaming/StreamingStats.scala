package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
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

  final case class TsEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String)

  /** Event-time sessionization: like [[sessionize]], but sessions ALSO
    * close when the event-time watermark passes `last + gapMs` — so an
    * idle user's final session flushes deterministically once the
    * stream's own clock proves the gap elapsed, instead of dangling in
    * state forever (the production shape: state is bounded by ACTIVE
    * sessions, not by users ever seen). Input needs (user_id, ts
    * timestamp, event_type); `watermark` bounds accepted disorder.
    */
  def sessionizeEventTime(
      events: DataFrame,
      gapMs: Long,
      watermark: String = "10 minutes"
  ): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]
    implicit val evEnc = Encoders.product[TsEvent]
    implicit val longEnc = Encoders.scalaLong
    events
      .withWatermark("ts", watermark)
      .as[TsEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, batch: Iterator[TsEvent], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed last + gap: the session is closed by time
            val s = state.get
            state.remove()
            Iterator.single(SessionOut(user, s.start, s.last, s.n))
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
            var cur = state.getOption
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_type)).foreach { e =>
              val ts = e.ts.getTime
              cur match {
                case Some(s) if ts - s.last <= gapMs =>
                  cur = Some(s.copy(last = math.max(s.last, ts), n = s.n + 1))
                case Some(s) =>
                  out += SessionOut(user, s.start, s.last, s.n)
                  cur = Some(SessionState(ts, ts, 1))
                case None =>
                  cur = Some(SessionState(ts, ts, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // the timeout must sit at-or-past the current watermark
              state.setTimeoutTimestamp(
                math.max(s.last + gapMs, state.getCurrentWatermarkMs + 1))
            }
            out.iterator
          }
      }
  }

  /** Streaming heavy-hitter candidates: per tumbling window, the
    * Misra–Gries summary of the window's token stream
    * ([[graft.functions.MisraGries]] — the sketch's mergeability is
    * exactly what lets it run as a streaming aggregation: micro-batch
    * partials merge into the window's state-store buffer, O(capacity)
    * per open window). Emits once the watermark closes the window.
    * Same guarantee as batch: every token above n_window/(capacity+1)
    * is present with a lower-bound count; re-count candidates exactly
    * downstream if exact figures are needed
    * ([[graft.ops.SketchOps.heavyHitters]] pass 2).
    */
  def windowedHeavyHitterCandidates(
      docs: DataFrame,
      capacity: Int,
      windowLen: String = "10 minutes",
      watermark: String = "5 minutes"
  ): DataFrame =
    docs
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.SketchFunctions.misraGries(
        graft.functions.TextFunctions.tokens(col("text")), capacity)
        .as("candidates"))
      .select(col("window.start").as("window_start"), col("candidates"))

  /** Streaming corpus report: the ingest-monitoring face of the batch
    * dataset-card query (q_corpus_report) — per tumbling window, doc
    * and token scale, mean tokens, and approximate language spread /
    * duplicate count. Distinct counts are HLL sketches
    * (`approx_count_distinct`, rsd 1%) because EXACT distinct
    * aggregation is unsupported — and unbounded — in a streaming agg;
    * the batch report owns the exact figures, this face owns the
    * monitor. One watermarked aggregation; per-open-window state is
    * counters + two HLL sketches, dropped when the watermark closes
    * the window. Input needs (ts timestamp, text string).
    */
  def windowedCorpusReport(
      docs: DataFrame,
      windowLen: String = "10 minutes",
      watermark: String = "5 minutes"
  ): DataFrame = {
    val nt = graft.functions.TextFunctions.tokenCount(col("text"))
      .cast("long")
    docs
      .withWatermark("ts", watermark)
      .withColumn("_nt", coalesce(nt, lit(0L)))
      .withColumn("_lang", graft.functions.TextFunctions.langId(col("text")))
      .withColumn("_h", md5(col("text")))
      .groupBy(window(col("ts"), windowLen))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("_nt")).as("n_tokens"),
        round(avg(col("_nt")), 6).as("mean_doc_tokens"),
        approx_count_distinct(col("_lang"), 0.01).as("approx_langs"),
        greatest(lit(0L),
          count(lit(1)) - approx_count_distinct(col("_h"), 0.01))
          .as("approx_dup_docs"))
      .select(col("window.start").as("window_start"),
        col("n_docs"), col("n_tokens"), col("mean_doc_tokens"),
        col("approx_langs"), col("approx_dup_docs"))
  }

  /** Streaming distribution-drift monitor: per event-time window,
    * KL(window ‖ ref) and total-variation distance of the hashed
    * token-bucket distribution against a STATIC reference count vector
    * (train it batch-side with
    * [[graft.ops.ImportanceOps.bucketCountsArray]]) — the streaming
    * face of [[graft.ops.ImportanceOps.distributionDrift]], for gating
    * mixture refreshes as intake arrives.
    *
    * Streaming shape: the whole per-window distribution comes out of
    * ONE aggregation (the mergeable
    * [[graft.functions.BucketCountsAgg]] — map-side partials, one
    * `buckets`-long row per window shuffles), and the metric
    * arithmetic is per-row HOFs over the two fixed-length arrays — no
    * second (bucket-keyed) aggregation, which streaming forbids, so
    * the query runs in ordinary append mode behind the watermark.
    *
    * Metric values match the batch op on the same rows up to HOF-vs-agg
    * summation order (≤ 1 ulp before the 6-decimal round;
    * StreamingStatsSpec pins the parity).
    *
    * Output per closed window: (window_start, batch_tokens, kl, tvd).
    */
  def windowedDriftMonitor(
      docs: DataFrame,
      refCounts: Array[Long],
      windowLen: String = "10 minutes",
      watermark: String = "5 minutes",
      smoothing: Double = 1.0
  ): DataFrame = {
    require(refCounts.nonEmpty, "refCounts must be non-empty")
    require(smoothing > 0.0, "smoothing must be positive")
    val buckets = refCounts.length
    val nr = refCounts.sum.toDouble
    val refLit = array(refCounts.map(lit): _*)
    val s = smoothing
    def pb(c: Column): Column =
      (c.cast("double") + s) / (col("batch_tokens").cast("double") + s * buckets)
    def pr(r: Column): Column = (r.cast("double") + s) / (nr + s * buckets)
    docs
      .withWatermark("ts", watermark)
      .withColumn("_t", graft.functions.TextFunctions.tokens(col("text")))
      .groupBy(window(col("ts"), windowLen))
      .agg(graft.functions.BloomFunctions.bucketCounts(col("_t"), buckets)
        .as("_wc"))
      .withColumn("batch_tokens",
        aggregate(col("_wc"), lit(0L), (a, x) => a + x))
      .withColumn("kl", round(aggregate(
        zip_with(col("_wc"), refLit, (c, r) => pb(c) * log(pb(c) / pr(r))),
        lit(0.0), (a, x) => a + x), 6))
      .withColumn("tvd", round(aggregate(
        zip_with(col("_wc"), refLit, (c, r) => abs(pb(c) - pr(r))),
        lit(0.0), (a, x) => a + x) / 2.0, 6))
      .select(col("window.start").as("window_start"),
        col("batch_tokens"), col("kl"), col("tvd"))
  }
}
