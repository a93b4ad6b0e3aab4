package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Streaming deduplication for ingest pipelines (SURVEY §2.12 extension;
  * the streaming face of [[graft.ops.DedupOps]]): drop exact duplicates
  * by normalized-content hash within a watermark horizon.
  *
  * Scale shape: `dropDuplicatesWithinWatermark` keys state by the
  * 128-bit content hash only — state is one (hash, latest-ts) entry per
  * distinct document seen inside the horizon and is evicted when the
  * watermark passes it, so a long-running ingest job's state is bounded
  * by (arrival rate × horizon), never by total corpus size. Documents
  * whose duplicates can straddle more than `horizon` of event time must
  * go through the batch LSH path instead.
  */
object StreamingDedup {

  /** Input: streaming DataFrame with (`ts` timestamp, `idCol`, `textCol`).
    * Output: first-seen rows only, with the content hash attached.
    */
  def dropExactDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      watermark: String = "10 minutes"
  ): DataFrame =
    docs
      .withColumn("content_hash", md5(TextFunctions.normalizedText(col(textCol))))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("content_hash")
}
