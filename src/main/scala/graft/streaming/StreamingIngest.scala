package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.api.MemoryManager

/** Structured Streaming ingest — the optional extension the reference
  * has no counterpart for (SURVEY §2.12): a stream of raw add events
  * `(user_id string, text string, ts long)` is consumed with
  * `writeStream.foreachBatch`; inside each micro-batch, events are
  * grouped per user and applied through that user's manager in event
  * order — reproducing the reference's per-user write lock
  * (manager.py:283-284) as per-user serialized batches.
  *
  * At scale each micro-batch is a bulk `addBatch` (one embed call + one
  * append per user), so throughput scales with users × batch size, not
  * with per-event overhead.
  */
final class StreamingIngest(managerFor: String => MemoryManager) {

  /** Start the ingest query. `events` must be a streaming DataFrame with
    * columns (user_id, text, ts).
    */
  def start(events: DataFrame, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatch(batch)
      }
      .start()

  /** One micro-batch: per-user, event-ordered bulk adds. Exposed for
    * direct testing and for batch backfill reuse.
    */
  def ingestBatch(batch: DataFrame): Unit =
    ingestWith(batch) { (mgr, texts, ts) =>
      mgr.addBatch(texts, now = Some(ts)); ()
    }

  /** RECONCILING streaming ingest — the W2b face of the stream: each
    * user's micro-batch routes through
    * [[MemoryManager.addReconcileBatch]], so arrivals reconcile against
    * the standing store (extraction, candidate search, SCD2 decisions)
    * with the batched path's bounded distributed-op count instead of
    * the ≈1 add/s per-add loop. Cross-batch semantics are sequential —
    * micro-batch N+1 sees every write N made (foreachBatch serializes
    * batches); within a micro-batch the documented intra-batch contract
    * applies (pre-batch snapshot), which is the natural watermark-sized
    * unit of "simultaneous" arrivals.
    */
  def startReconciling(events: DataFrame, checkpointDir: String): StreamingQuery =
    events.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        ingestBatchReconciling(batch)
      }
      .start()

  /** One reconciling micro-batch (see [[startReconciling]]). */
  def ingestBatchReconciling(batch: DataFrame): Unit =
    ingestWith(batch) { (mgr, texts, ts) =>
      mgr.addReconcileBatch(texts, now = Some(ts)); ()
    }

  private def ingestWith(batch: DataFrame)(
      apply: (MemoryManager, Seq[String], Long) => Unit): Unit = {
    val perUser = batch
      .select(col("user_id").cast("string"), col("text"), col("ts").cast("long"))
      .collect()
      .groupBy(_.getString(0))
    // deterministic user order; within a user, event order by (ts, text)
    perUser.toSeq.sortBy(_._1).foreach { case (user, rows) =>
      val ordered = rows.sortBy(r => (r.getLong(2), r.getString(1)))
      apply(managerFor(user), ordered.map(_.getString(1)).toSeq,
        ordered.last.getLong(2))
    }
  }
}
