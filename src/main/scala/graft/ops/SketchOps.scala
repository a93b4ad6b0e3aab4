package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.{SketchFunctions, TextFunctions}

/** Sketch-backed corpus profiling ops.
  *
  * [[heavyHitters]] is the canonical two-pass exact heavy-hitters
  * dataflow (MG candidates + exact re-count), the scalable form of
  * "which tokens exceed φ of the corpus" — at 100 TB the exact
  * token-groupBy alternative shuffles the whole token stream to answer
  * a question whose output is at most 1/φ rows.
  *
  * Reference tie-in: the reference profiles corpora with exact
  * vocabulary aggregation (vocab top-k, `q_vocab_topk`); this is the
  * sketch-accelerated face of the same profiling surface for thresholds
  * rather than ranks.
  */
object SketchOps {

  /** All tokens with frequency strictly above `phi`·n (n = total token
    * count over non-null `textCol`), with EXACT counts. Output:
    * (token, cnt) ordered by token — deterministic, despite the
    * order-sensitive sketch underneath, because:
    *
    * pass 1 — ONE linear scan aggregated by the mergeable
    * [[graft.functions.MisraGries]] sketch (capacity ceil(slack/φ) ≥
    * 1/φ, so every true φ-heavy token is in the candidate set no matter
    * how partitions merged) plus the exact token total; one
    * sketch-sized row reaches the driver, never the tokens;
    *
    * pass 2 — candidates (≤ capacity rows) broadcast back, a second
    * linear scan re-counts ONLY candidate tokens exactly (map-side
    * combine on ≤ capacity distinct keys), and the strict > φ·n filter
    * drops the sketch's false positives.
    *
    * Scale shape: two scans, zero token-keyed shuffles, O(1/φ) state
    * everywhere; candidate-set nondeterminism is quarantined by the
    * exact re-count. `slack` > 1 widens the sketch purely to keep the
    * candidate list comfortably superset (capacity trades executor
    * memory for nothing else).
    */
  def heavyHitters(
      df: DataFrame,
      textCol: String,
      phi: Double,
      slack: Double = 2.0): DataFrame = {
    require(phi > 0.0 && phi < 1.0, "phi must be in (0, 1)")
    require(slack >= 1.0, "slack must be >= 1 (capacity must cover 1/phi)")
    val spark = df.sparkSession
    import spark.implicits._
    val capacity = math.max(1, math.ceil(slack / phi).toInt)
    val toks = TextFunctions.tokens(col(textCol))

    val docs = df.filter(col(textCol).isNotNull)
    val sk = docs
      .select(toks.as("_toks"))
      .agg(
        SketchFunctions.misraGries(col("_toks"), capacity).as("cand"),
        sum(size(col("_toks"))).as("n"))
      .head() // exactly one row, O(capacity) — the API-boundary collect
    val n = if (sk.isNullAt(1)) 0L else sk.getLong(1)
    val cands = sk.getSeq[Row](0).map(_.getString(0))
    if (n == 0L || cands.isEmpty) {
      return spark.emptyDataset[(String, Long)].toDF("token", "cnt")
    }

    val candDf = cands.toDF("token")
    docs
      .select(explode(toks).as("token"))
      .join(broadcast(candDf), Seq("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(phi) * lit(n.toDouble))
      .orderBy(col("token"))
  }

  /** Per-group approximate distinct count with a VERIFIED error
    * contract — the [[graft.ops.QuantileOps.approxPercentilesChecked]]
    * pattern applied to cardinality: estimation is Spark's builtin
    * HyperLogLog++ (`approx_count_distinct`, mergeable, one scan,
    * O(1/rsd²) state per group), and the op ALSO computes the exact
    * distinct count to report whether the estimate sits within
    * `sigmas` standard errors (rsd is HLL++'s relative standard
    * deviation). The exact side is affordable at gate scale and
    * optional at 100 TB — there the estimate ships alone, and THIS op
    * is the harness that proves the sketch configuration honest before
    * you rely on it.
    *
    * The HLL++ estimate itself is deterministic for a fixed value SET
    * (register maxes are order-independent), but the CONTRACT column
    * is what the oracle gates: a broken sketch or a mis-set rsd reds
    * the row for any layout.
    *
    * Output: (groupCol, n_distinct — exact, within_bound) ordered.
    */
  def approxDistinctChecked(
      df: DataFrame,
      valueCol: String,
      groupCol: String,
      rsd: Double = 0.05,
      sigmas: Double = 5.0): DataFrame = {
    require(rsd > 0.0 && rsd < 1.0, "rsd must be in (0, 1)")
    require(sigmas > 0.0, "sigmas must be positive")
    df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(
        approx_count_distinct(col(valueCol), rsd).as("_a"),
        countDistinct(col(valueCol)).as("n_distinct"))
      .select(col(groupCol), col("n_distinct"),
        (abs(col("_a") - col("n_distinct")).cast("double") <=
          greatest(lit(1.0),
            lit(sigmas * rsd) * col("n_distinct").cast("double")))
          .as("within_bound"))
      .orderBy(col(groupCol))
  }
}
