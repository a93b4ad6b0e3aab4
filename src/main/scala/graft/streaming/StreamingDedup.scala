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
    * `idCol` documents the caller's id column (it passes through
    * untouched); dedup keys on CONTENT only, never on the id.
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

  /** NEAR-dup streaming dedup at fingerprint granularity: drop documents
    * whose `bits`-wide simhash matches one already seen in the horizon.
    * The simhash vote sum is order- and casing-insensitive over tokens,
    * so word reorderings, whitespace/punctuation edits and many small
    * in-place variants collapse to the SAME fingerprint — caught here at
    * exact-dedup state cost (one (fingerprint, ts) entry per distinct
    * fingerprint in the horizon).
    *
    * Contract: Hamming distance >= 1 is NOT folded in — a banded
    * multi-key keep decision is circular in streaming (whether to insert
    * a band entry depends on all other bands' verdicts); corpora needing
    * radius-k near-dup go through the batch banded path
    * ([[graft.ops.DedupOps.simhashNearDupPairs]]).
    */
  def dropFingerprintDuplicates(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      watermark: String = "10 minutes",
      bits: Int = 32
  ): DataFrame =
    docs
      .withColumn("simhash", graft.functions.HashFunctions.simhash(col(textCol), bits))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("simhash")
}
