package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions

/** Skew-aware shuffle joins: the salting transform that keeps a 100-TB
  * shuffle join alive when a handful of keys own a disproportionate
  * share of the rows (the classic "one straggler reducer" failure).
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) already
  * handles MEASURED partition-size skew at runtime; this operator is
  * the complementary declarative form for when the skew is KEY-level
  * and known/detectable up front — it spreads each heavy key across
  * `saltFactor` sub-keys on the big side and replicates only the heavy
  * keys' rows on the other side, so no reducer sees more than
  * ~1/saltFactor of a heavy key. Light keys pay nothing (salt 0, no
  * replication) — detection is the [[SketchOps]] Misra–Gries two-pass,
  * so finding the heavy keys costs one O(1/phi)-state scan, never a
  * key-keyed shuffle.
  */
object SkewOps {

  /** Exact counts of join-key values owning more than `phi` of the
    * rows — the generic-key face of [[SketchOps.heavyHitters]] (same
    * two-pass contract: mergeable MG sketch for candidates, bounded
    * broadcast re-count for exactness; deterministic output despite
    * the order-sensitive sketch underneath).
    *
    * Output: (key: string, cnt) ordered by key.
    */
  def heavyKeys(
      df: DataFrame,
      keyCol: String,
      phi: Double,
      slack: Double = 2.0): DataFrame = {
    require(phi > 0.0 && phi < 1.0, "phi must be in (0, 1)")
    require(slack >= 1.0, "slack must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    val capacity = math.max(1, math.ceil(slack / phi).toInt)
    val keyed = df.filter(col(keyCol).isNotNull)
      .select(col(keyCol).cast("string").as("_k"))
    val sk = keyed
      .agg(SketchFunctions.misraGries(array(col("_k")), capacity).as("cand"),
        count(lit(1)).as("n"))
      .head() // one row, O(capacity) — the API-boundary collect
    val n = sk.getLong(1)
    val cands = sk.getSeq[Row](0).map(_.getString(0))
    if (n == 0L || cands.isEmpty) {
      return spark.emptyDataset[(String, Long)].toDF("key", "cnt")
    }
    keyed
      .join(broadcast(cands.toDF("_k")), Seq("_k"))
      .groupBy(col("_k").as("key"))
      .agg(count(lit(1)).as("cnt"))
      .filter(col("cnt").cast("double") > lit(phi) * lit(n.toDouble))
      .orderBy(col("key"))
  }

  /** Skew-salted inner equi-join on `keyCol`: row-multiset-identical
    * to `big.join(right, Seq(keyCol))`, but every key in `heavy` has
    * its big-side rows spread across `saltFactor` sub-keys (salt =
    * hash of the full row — deterministic, layout-independent) and its
    * right-side rows replicated once per salt; light keys keep salt 0
    * and are never replicated. The shuffle therefore bounds any single
    * reducer's share of a heavy key at ~1/saltFactor, at the cost of
    * (saltFactor − 1) extra copies of the heavy keys' RIGHT rows only.
    *
    * `heavy` defaults to [[heavyKeys]] detection on the big side at
    * `phi`; pass an explicit key list to skip the detection scan.
    *
    * Scale shape: one MG detection scan (optional) + the same single
    * shuffle a plain join pays, now on (key, salt) — uniform by
    * construction. Right-side replication is bounded by
    * |heavy| · saltFactor ≤ saltFactor/phi rows.
    */
  def saltedJoin(
      big: DataFrame,
      right: DataFrame,
      keyCol: String,
      saltFactor: Int,
      phi: Double = 0.001,
      heavy: Option[Seq[String]] = None): DataFrame = {
    require(saltFactor >= 2, "saltFactor must be >= 2")
    val heavySet = heavy.getOrElse(
      heavyKeys(big, keyCol, phi).collect().map(_.getString(0)).toSeq)
    if (heavySet.isEmpty) return big.join(right, Seq(keyCol))
    val spark = big.sparkSession
    import spark.implicits._
    val hDf = broadcast(heavySet.toDF("_hk"))
    val isHeavy: Column = col("_hk").isNotNull
    val big2 = big
      .join(hDf, big(keyCol).cast("string") === col("_hk"), "left")
      .withColumn("_salt",
        when(isHeavy,
          pmod(xxhash64(struct(big.columns.map(big(_)): _*)),
            lit(saltFactor.toLong)).cast("int"))
          .otherwise(lit(0)))
      .drop("_hk")
    val right2 = right
      .join(hDf, right(keyCol).cast("string") === col("_hk"), "left")
      .withColumn("_salts",
        when(isHeavy, sequence(lit(0), lit(saltFactor - 1)))
          .otherwise(array(lit(0))))
      .withColumn("_salt", explode(col("_salts")))
      .drop("_hk", "_salts")
    big2.join(right2, Seq(keyCol, "_salt")).drop("_salt")
  }
}
