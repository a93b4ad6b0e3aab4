package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** Data-selection by importance resampling (the DSIR recipe: hashed
  * n-gram bag-of-words language models for a target domain vs the raw
  * pool, per-document log importance weights, then Gumbel top-k
  * sampling without replacement — Xie et al., "Data Selection for
  * Language Models via Importance Resampling", NeurIPS 2023; public
  * literature).
  *
  * This is the principled version of the per-source quota knobs the
  * rest of the corpus surface exposes (`weightedMix`,
  * `adaptiveFilter`): instead of hand-set quotas, the target corpus
  * itself defines which raw documents are "target-like", and sampling
  * is proportional to exp(weight/τ) exactly, via the Gumbel-max trick,
  * with a deterministic seeded hash as the noise source so the sample
  * is reproducible run-to-run and oracle-checkable.
  *
  * Scale shape (the 100 TB contract):
  *  - both LMs are `buckets`-row tables built by ONE (is_target,
  *    bucket)-keyed count agg over the token stream — map-side
  *    combinable, bounded output, never a token-keyed vocabulary agg;
  *  - the λ = log p_target − log p_raw table (≤ `buckets` rows)
  *    broadcasts back; per-document weights are one doc-keyed sum agg;
  *  - resampling is TakeOrdered top-k on weight/τ + Gumbel(doc, seed) —
  *    per-partition heaps, no global sort.
  */
object ImportanceOps {

  /** Per-document DSIR importance weights.
    *
    * `isTarget` marks the rows whose token distribution defines the
    * target LM; every other row feeds the raw LM. Both LMs are hashed
    * unigram bags over `buckets` buckets (md5-based, matching
    * [[CorpusOps.hashBucket]] and the classifier's feature hashing)
    * with add-`smoothing` Laplace estimates, so λ is defined on every
    * bucket even where a side saw no mass.
    *
    * Output: one row per input row — (idCol, is_target, n_tok,
    * weight) with weight = Σ_tokens λ(bucket(token)); docs with no
    * tokens (or null text) get n_tok 0, weight 0.
    */
  def importanceWeights(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      smoothing: Double = 1.0): DataFrame = {
    val tagged = df.select(col(idCol).as("doc"), isTarget.as("is_target"),
      col(textCol).as("_text"))
    val tokens = taggedTokens(tagged, buckets)
    val lam = lambdaTable(tokens, buckets, smoothing)

    val perDoc = tokens
      .join(broadcast(lam), Seq("bucket"))
      .groupBy(col("doc"))
      .agg(count(lit(1)).as("n_tok"), sum(col("lambda")).as("weight"))

    tagged.select(col("doc"), col("is_target"))
      .join(perDoc, Seq("doc"), "left")
      .select(col("doc"), col("is_target"),
        coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        coalesce(col("weight"), lit(0.0)).as("weight"))
  }

  /** The trained model by itself — λ per bucket as a plain array
    * (index = bucket), e.g. to hand to
    * [[graft.streaming.StreamingPrep.importanceGate]] as the static
    * stream-side model. One corpus scan.
    */
  def lambdaArray(
      df: DataFrame,
      idCol: String,
      textCol: String,
      isTarget: Column,
      buckets: Int = 1024,
      smoothing: Double = 1.0): Array[Double] = {
    val tagged = df.select(col(idCol).as("doc"), isTarget.as("is_target"),
      col(textCol).as("_text"))
    val lam = lambdaTable(taggedTokens(tagged, buckets), buckets, smoothing)
    val out = new Array[Double](buckets)
    lam.collect().foreach(r => out(r.getLong(0).toInt) = r.getDouble(1))
    out
  }

  private def taggedTokens(tagged: DataFrame, buckets: Int): DataFrame =
    tagged
      .filter(col("_text").isNotNull)
      .select(col("doc"), col("is_target"),
        explode(TextFunctions.tokens(col("_text"))).as("token"))
      .withColumn("bucket", CorpusOps.hashBucket(col("token"), buckets))

  /** λ = log p_target − log p_raw per bucket (buckets rows). The
    * localCheckpoint on the bucket counts is load-bearing for the scan
    * count: bc feeds THREE consumers (target side, raw side, totals)
    * and Spark re-derives an unmaterialized subtree per consumer —
    * without it the corpus is scanned and re-tokenized once per
    * reference (probed: 10 scans / 8 kernel evaluations in the
    * resample plan). Materializing ≤ 2·buckets rows pins the corpus
    * cost at exactly two tokenize passes (LM build + per-doc scoring).
    */
  private def lambdaTable(
      tokens: DataFrame,
      buckets: Int,
      smoothing: Double): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(smoothing > 0.0, "smoothing must be positive")
    val spark = tokens.sparkSession
    val bc = tokens.groupBy(col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint()
    val totals = bc.groupBy(col("is_target")).agg(sum(col("cnt")).as("tot"))
    val totWide = totals
      .agg(
        sum(when(col("is_target"), col("tot")).otherwise(lit(0L))).as("nt"),
        sum(when(!col("is_target"), col("tot")).otherwise(lit(0L))).as("nr"))

    val allB = spark.range(buckets).select(col("id").as("bucket"))
    allB
      .join(bc.filter(col("is_target")).select(col("bucket"), col("cnt").as("tc")),
        Seq("bucket"), "left")
      .join(bc.filter(!col("is_target")).select(col("bucket"), col("cnt").as("rc")),
        Seq("bucket"), "left")
      .crossJoin(broadcast(totWide))
      .select(col("bucket"),
        (log((coalesce(col("tc"), lit(0L)).cast("double") + lit(smoothing)) /
             (col("nt").cast("double") + lit(smoothing * buckets))) -
         log((coalesce(col("rc"), lit(0L)).cast("double") + lit(smoothing)) /
             (col("nr").cast("double") + lit(smoothing * buckets))))
          .as("lambda"))
  }

  /** Seeded Gumbel noise in column form: u = (h32 + 0.5) / 2^32 with
    * h32 the first 8 md5 hex digits of s"$seed-$doc" — u ∈ (0,1) is
    * bit-identical in any engine with the same md5 (the +0.5 and the
    * power-of-two divisor are exact in binary64). The final
    * g = −ln(−ln u) is deterministic per engine but only
    * last-ulp-reproducible ACROSS engines: ln rounding may differ
    * between libm implementations, so a cross-engine top-k over these
    * keys can in principle flip on a near-exact tie (u values are
    * distinct by construction, which makes actual key ties measure-zero
    * but not impossible after the double ln).
    */
  def gumbelNoise(doc: Column, seed: String): Column = {
    val h = conv(substring(md5(concat(lit(s"$seed-"), doc.cast("string"))), 1, 8),
      16, 10).cast("double")
    val u = (h + lit(0.5)) / lit(4294967296.0)
    -log(-log(u))
  }

  /** Gumbel top-k importance resampling: keep the k rows maximizing
    * weight/τ + Gumbel(doc, seed) — an exact sample without replacement
    * from softmax(weight/τ) (Gumbel-max trick), reproducible because
    * the noise is a seeded hash of the id. Plans as
    * TakeOrderedAndProject. Output: (doc, weight, key), key descending.
    */
  def importanceResample(
      weights: DataFrame,
      k: Int,
      temperature: Double = 1.0,
      seed: String = "dsir"): DataFrame = {
    require(k > 0, "k must be positive")
    require(temperature > 0.0, "temperature must be positive")
    weights
      .select(col("doc"), col("weight"),
        (col("weight") / lit(temperature) + gumbelNoise(col("doc"), seed))
          .as("key"))
      .orderBy(col("key").desc, col("doc"))
      .limit(k)
  }

  /** The reference half of drift monitoring exported as a plain count
    * vector (index = bucket) — ONE scan reduced by the mergeable
    * [[graft.functions.BucketCountsAgg]]; hand it to
    * [[graft.streaming.StreamingStats.windowedDriftMonitor]] as the
    * static stream-side model (the [[lambdaArray]] pattern).
    */
  def bucketCountsArray(
      df: DataFrame,
      textCol: String,
      buckets: Int = 1024): Array[Long] = {
    require(buckets > 0, "buckets must be positive")
    df.filter(col(textCol).isNotNull)
      .select(TextFunctions.tokens(col(textCol)).as("_t"))
      .agg(graft.functions.BloomFunctions.bucketCounts(col("_t"), buckets))
      .head().getSeq[Long](0).toArray
  }

  /** Corpus distribution-drift monitor: KL(batch ‖ ref) and total
    * variation distance between two corpora's token distributions over
    * the same hashed buckets the DSIR LMs use — the continuous-pipeline
    * check "did today's intake shift from the reference mix" that
    * gates a mixture-weight refresh or a retrain, without ever
    * materializing a vocabulary.
    *
    * Both distributions are Laplace-smoothed over the full bucket
    * spine (p_b = (c_b + smoothing) / (n + smoothing·buckets)), so KL
    * is finite even where a side saw no mass, and the hashing makes
    * the comparison vocabulary-unbounded: state is `buckets` rows
    * regardless of corpus size.
    *
    * Scale shape: ONE (side, bucket) count agg over both token streams
    * (map-side combinable, ≤ 2·buckets rows out) + arithmetic on the
    * bucket spine. Nothing else touches the data.
    *
    * Output: one row — (ref_tokens, batch_tokens, kl, tvd), metrics
    * rounded to 6 decimals (Tables.scala conventions).
    */
  def distributionDrift(
      ref: DataFrame,
      batch: DataFrame,
      textCol: String,
      buckets: Int = 1024,
      smoothing: Double = 1.0): DataFrame = {
    require(buckets > 0, "buckets must be positive")
    require(smoothing > 0.0, "smoothing must be positive")
    val spark = ref.sparkSession
    val tagged = ref.select(lit(false).as("is_batch"), col(textCol).as("_text"))
      .unionByName(
        batch.select(lit(true).as("is_batch"), col(textCol).as("_text")))
    val bc = tagged
      .filter(col("_text").isNotNull)
      .select(col("is_batch"),
        explode(TextFunctions.tokens(col("_text"))).as("token"))
      .withColumn("bucket", CorpusOps.hashBucket(col("token"), buckets))
      .groupBy(col("is_batch"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint() // feeds totals + both spine joins once
    val tot = bc.agg(
      sum(when(!col("is_batch"), col("cnt")).otherwise(lit(0L))).as("nr"),
      sum(when(col("is_batch"), col("cnt")).otherwise(lit(0L))).as("nb"))
    val spine = spark.range(buckets).select(col("id").as("bucket"))
      .join(bc.filter(!col("is_batch")).select(col("bucket"), col("cnt").as("cr")),
        Seq("bucket"), "left")
      .join(bc.filter(col("is_batch")).select(col("bucket"), col("cnt").as("cb")),
        Seq("bucket"), "left")
      .crossJoin(broadcast(tot))
    val pr = (coalesce(col("cr"), lit(0L)) + smoothing) /
      (col("nr") + smoothing * buckets)
    val pb = (coalesce(col("cb"), lit(0L)) + smoothing) /
      (col("nb") + smoothing * buckets)
    spine
      .agg(
        max(col("nr")).as("ref_tokens"),
        max(col("nb")).as("batch_tokens"),
        round(sum(pb * log(pb / pr)), 6).as("kl"),
        round(sum(abs(pb - pr)) / 2.0, 6).as("tvd"))
  }
}
