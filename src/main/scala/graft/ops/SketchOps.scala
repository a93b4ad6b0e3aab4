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
}
