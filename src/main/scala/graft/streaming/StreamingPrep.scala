package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.PiiOps

/** The streaming face of the composed prep chain (q_prep_pipeline):
  * language filter → Gopher quality gate → exact dedup within the
  * watermark horizon, as ONE streaming query. This is the shape a
  * continuously-ingesting corpus runs instead of the batch chain — the
  * gates are stateless per-row kernels (identical filters, identical
  * kernels, so a doc passes the stream iff it passes the batch chain),
  * and the only state is the exact-dedup hash horizon
  * ([[StreamingDedup.dropExactDuplicates]]: rate × horizon entries,
  * never corpus-sized).
  *
  * Shard packing is deliberately NOT composed here: a global
  * prefix-sum order over an unbounded stream is not meaningful —
  * packing runs as a periodic batch job over the accumulated survivors
  * (the standard lambda split for order-dependent steps).
  *
  * Input: streaming (`ts`, `idCol`, `textCol`). Output: survivor rows
  * with (`lang_pred`, `n_tokens`, `content_hash`) attached; with
  * `redactPii` the text column is replaced by its scrubbed form
  * ([[PiiOps.redact]] — stateless per-row regex work, so it composes
  * into the same streaming stage with no extra state). Redaction runs
  * AFTER the dedup keying on the raw text: two docs identical up to
  * their (distinct) PII are different documents, and must stay so.
  */
object StreamingPrep {

  def prepStream(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String = "en",
      minWords: Int = 20,
      watermark: String = "10 minutes",
      redactPii: Boolean = false
  ): DataFrame = {
    val t = col(textCol)
    val deduped = prepRaw(docs, idCol, textCol, lang, minWords, watermark)
    if (redactPii) deduped.withColumn(textCol, PiiOps.redact(t)) else deduped
  }

  private def prepRaw(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      lang: String,
      minWords: Int,
      watermark: String
  ): DataFrame = {
    val t = col(textCol)
    val gated = docs
      .withColumn("lang_pred", TextFunctions.langId(t))
      .filter(col("lang_pred") === lit(lang))
      .filter(TextFunctions.gopherWordCountOk(t, lo = minWords) &&
        TextFunctions.gopherMeanLenOk(t) &&
        TextFunctions.gopherSymbolRatio(t) < 0.1 &&
        TextFunctions.gopherStopHits(t) >= 2)
      .withColumn("n_tokens", TextFunctions.tokenCount(t).cast("long"))
    StreamingDedup.dropExactDuplicates(gated, idCol, textCol, watermark)
  }
}
