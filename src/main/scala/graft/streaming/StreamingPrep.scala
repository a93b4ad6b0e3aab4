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

  /** Streaming DSIR gate: score each document's importance weight
    * against a STATIC bucket-λ table (trained offline by
    * [[graft.ops.ImportanceOps.importanceWeights]]' LM build — pass its
    * λ values here) and keep docs at or above `threshold`. The λ table
    * rides the plan as an array literal and the whole computation is
    * stateless per-row builtins (tokens kernel → md5 bucket →
    * element_at → aggregate-sum), so the gate composes into any
    * streaming stage with ZERO state — the stream-side twin of the
    * batch weight op, summing in token order (the batch groupBy may
    * differ in the last ulps; gate thresholds should not sit on a
    * document's exact weight).
    *
    * Adds `dsir_weight`; filters to weight ≥ threshold.
    */
  def importanceGate(
      docs: DataFrame,
      textCol: String,
      lambdas: Array[Double],
      threshold: Double
  ): DataFrame = {
    val buckets = lambdas.length
    require(buckets > 0, "lambdas must be non-empty")
    val lamLit = array(lambdas.map(lit): _*)
    val weight = aggregate(
      transform(
        TextFunctions.tokens(col(textCol)),
        t => element_at(lamLit,
          (graft.ops.CorpusOps.hashBucket(t, buckets) + lit(1)).cast("int"))),
      lit(0.0),
      (acc, x) => acc + x)
    docs
      .withColumn("dsir_weight", weight)
      .filter(col("dsir_weight") >= threshold)
  }

  /** Streaming domain gate — the stream face of the RefinedWeb domain
    * prior (q_domain_quality / q_prep_pipeline stage 0): extract the
    * registrable domain of each doc's URL
    * ([[graft.functions.UrlFunctions.registrableDomain]], full PSL
    * semantics) and keep docs whose domain the STATIC prior table
    * marks kept. Like [[importanceGate]], the model is static data and
    * the computation is stateless per-row kernels + one stream-static
    * broadcast join, so the gate carries ZERO streaming state; the
    * prior table (the batch q_domain_quality output, or any
    * (domain, kept) frame) is re-read per micro-batch when it is a
    * file source — the "slowly-updated broadcast" refresh pattern.
    *
    * `keepUnseen` decides domains absent from the table (a new site
    * mid-stream): keep by default — the batch prior recomputes on the
    * next refresh; a strict allowlist deployment passes false.
    *
    * Adds `domain`; filters by the prior.
    */
  def domainGate(
      docs: DataFrame,
      urlCol: String,
      domainPriors: DataFrame,
      keepUnseen: Boolean = true
  ): DataFrame = {
    import graft.functions.UrlFunctions
    // dropDuplicates: a prior table rebuilt by appending batch outputs
    // can carry duplicate domain keys, and a duplicated key would FAN
    // OUT stream rows through the join — dedup the (small, broadcast)
    // side, keeping any one verdict per domain
    val priors = broadcast(
      domainPriors.select(col("domain"), col("kept").as("_domain_kept"))
        .dropDuplicates("domain"))
    docs
      .withColumn("domain",
        UrlFunctions.registrableDomain(UrlFunctions.urlHost(col(urlCol))))
      .join(priors, Seq("domain"), "left")
      .filter(coalesce(col("_domain_kept"), lit(keepUnseen)))
      .drop("_domain_kept")
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
