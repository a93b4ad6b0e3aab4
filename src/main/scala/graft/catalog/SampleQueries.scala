package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{QuantileOps, SampleOps, SimilarityOps}
import Tables.load

/** Exact-quota sampling queries (SampleOps): per-stratum quota sampling
  * over `documents`, and cluster-balanced capping over `embeddings`
  * (IVF-cell strata). Oracles replay the selection as a per-stratum
  * `row_number` window over the same md5 ordering key — the naive form
  * whose per-stratum sort the Spark side's two-level selection exists
  * to avoid.
  */
object SampleQueries {

  /** Per-language quotas chosen to exercise every classification path
    * at sf0.01/sf0.1: below stratum size (en/fr partial), near it (de),
    * far above it (es = whole stratum), and an absent stratum (zh has
    * no quota row → dropped entirely).
    */
  private val LangQuotas = Map("en" -> 100L, "de" -> 50L, "es" -> 5000L,
    "fr" -> 40L)

  private val ClusterCap = 30L
  private[catalog] val KCenterK = 8

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_sample_stratified" -> { (s, dir) =>
      val docs = load(s, dir, "documents")
        .repartition(s.sessionState.conf.numShufflePartitions)
      SampleOps.stratifiedSample(docs, "doc_id", "lang", LangQuotas)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    },
    "q_sample_cluster" -> { (s, dir) =>
      // balanced-diversity cap: at most ClusterCap vectors per IVF cell
      // (same strided index as q_ann_ivf, so the oracle replays the
      // cell assignment exactly)
      val emb = load(s, dir, "embeddings")
      val (assigned, _) = SimilarityOps.ivfIndex(emb, "vec_id", "embedding",
        numCells = SimilarityQueries.IvfCells)
      SampleOps.capPerStratum(assigned, "vec_id", "cell", ClusterCap)
        .select(col("vec_id"), col("cell").cast("long").as("cell"))
        .orderBy(col("vec_id"))
    },
    "q_sample_kcenter" -> { (s, dir) =>
      // greedy k-center diversity selection: 8 farthest-point centers
      // over the embedding space (k−1 TakeOrdered(1) argmax passes)
      val emb = load(s, dir, "embeddings")
      SampleOps.kCenterSelect(emb, "vec_id", "embedding", k = KCenterK)
        .select(col("rank"), col("id").as("vec_id"),
          round(col("dist"), 6).as("dist"))
        .orderBy(col("rank"))
    },
    "q_corpus_quantiles" -> { (s, dir) =>
      // corpus profiling: exact per-source length percentiles via the
      // value-range two-level selection (no per-source sort, no
      // percentile_approx error bars)
      val docs = load(s, dir, "documents")
        .repartition(s.sessionState.conf.numShufflePartitions)
      QuantileOps.exactPercentiles(docs, "n_chars", "source", Percentiles)
        .orderBy(col("source"), col("p"))
    },
    "q_outliers_mad" -> { (s, dir) =>
      // robust length-outlier detection: |n_chars − median(source)| >
      // 3·MAD(source) — all-integer decision (two nearest-rank medians),
      // so the flag set is bit-stable across engines
      val docs = load(s, dir, "documents")
      QuantileOps.madOutliers(docs, "n_chars", "source", k = 3)
        .select(col("doc_id"), col("source"), col("n_chars"),
          col("med"), col("mad"), col("dev"))
        .orderBy(col("doc_id"))
    },
    "q_quantile_approx" -> { (s, dir) =>
      // single-pass sketch percentiles with the verified error
      // contract: the within_bound column (estimate's exact rank
      // interval intersects target ± ceil(n/accuracy)) is the
      // deterministic gate output — true on every row for ANY merge
      // order iff the sketch honors its guarantee
      val docs = load(s, dir, "documents")
      QuantileOps.approxPercentilesChecked(docs, "n_chars", "lang",
          Map("p50" -> 50, "p90" -> 90, "p99" -> 99), accuracy = 1000)
    },
    "q_distinct_approx" -> { (s, dir) =>
      // HLL++ distinct vocabulary per source with the verified
      // contract: exact count ships (deterministic), within_bound
      // gates the sketch against 5σ of its configured rsd
      val docs = load(s, dir, "documents")
      val toks = docs.select(col("source"),
        explode(graft.functions.TextFunctions.tokens(col("text"))).as("tok"))
      graft.ops.SketchOps.approxDistinctChecked(toks, "tok", "source",
        rsd = 0.05)
    },
    "q_filter_adaptive" -> { (s, dir) =>
      // adaptive per-source gate: drop docs below their OWN source's
      // p10 length — the dynamic-threshold pattern (a fixed global
      // cutoff over- or under-filters heterogeneous sources). The
      // threshold table is one row per source → broadcast; the corpus
      // pays one scan + one map-side join
      val docs = load(s, dir, "documents")
        .repartition(s.sessionState.conf.numShufflePartitions)
      val thr = QuantileOps.exactPercentiles(docs, "n_chars", "source",
          Map("p10" -> 10))
        .select(col("source"), col("quantile").as("thr"))
      docs.join(broadcast(thr), "source")
        .filter(col("n_chars") >= col("thr"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("thr"))
        .orderBy(col("doc_id"))
    }
  )

  private val Percentiles = Map("p50" -> 50, "p90" -> 90, "p99" -> 99)

  /** md5 sample-order key, DuckDB side (mirror of SampleOps.sampleKey). */
  private def sqlKey(id: String): String =
    s"(('0x' || substr(md5($id::VARCHAR), 1, 8))::UBIGINT)::BIGINT"

  def oracle: Map[String, String] = {
    val quotaRows = SampleQueries.LangQuotas.toSeq.sorted
      .map { case (l, q) => s"('$l', $q)" }.mkString(", ")
    val stratified =
      s"""WITH quotas(lang, quota) AS (VALUES $quotaRows),
         |r AS (SELECT doc_id, lang, source,
         |  row_number() OVER (PARTITION BY lang
         |    ORDER BY ${sqlKey("doc_id")}, doc_id) AS rn
         |  FROM documents)
         |SELECT r.doc_id, r.lang, r.source
         |FROM r JOIN quotas USING (lang) WHERE r.rn <= quotas.quota
         |ORDER BY r.doc_id""".stripMargin

    import SimilarityQueries.{cos, IvfCells}
    val cluster =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS cv
         |         FROM (SELECT e.vec_id, e.v
         |               FROM e CROSS JOIN (SELECT greatest(1, count(*) // $IvfCells) AS stride FROM e) s
         |               WHERE e.vec_id % s.stride = 0
         |               ORDER BY e.vec_id LIMIT $IvfCells)),
         |assigned AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cent.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent) WHERE rn = 1),
         |r AS (SELECT vec_id, cell,
         |  row_number() OVER (PARTITION BY cell
         |    ORDER BY ${sqlKey("vec_id")}, vec_id) AS rn
         |  FROM assigned)
         |SELECT vec_id, cell::BIGINT AS cell FROM r WHERE rn <= $ClusterCap
         |ORDER BY vec_id""".stripMargin

    // same k = ceil(pct·n/100) integer arithmetic as
    // QuantileOps.exactPercentiles; row_number ties need no tie-break
    // (any of the equal rows at rank k carries the k-th smallest VALUE)
    val pctRows = Percentiles.toSeq.sortBy(_._1)
      .map { case (l, p) => s"('$l', $p)" }.mkString(", ")
    val quantiles =
      s"""WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |t(p, pct) AS (VALUES $pctRows),
         |r AS (SELECT source, n_chars,
         |  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn
         |  FROM documents)
         |SELECT r.source, t.p, r.n_chars AS quantile
         |FROM r JOIN s USING (source)
         |JOIN t ON r.rn = (t.pct * s.n + 99) // 100
         |ORDER BY r.source, t.p""".stripMargin

    val adaptive =
      s"""WITH s AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
         |r AS (SELECT doc_id, source, n_chars,
         |  row_number() OVER (PARTITION BY source ORDER BY n_chars) AS rn
         |  FROM documents),
         |thr AS (SELECT r.source, r.n_chars AS thr
         |  FROM r JOIN s USING (source) WHERE r.rn = (10 * s.n + 99) // 100)
         |SELECT d.doc_id, d.source, d.n_chars, thr.thr
         |FROM documents d JOIN thr USING (source)
         |WHERE d.n_chars >= thr.thr ORDER BY d.doc_id""".stripMargin

    // greedy k-center unrolled step by step (KCenterK−1 argmax rounds),
    // same d² = ⟨x,x⟩ − 2⟨x,c⟩ + ⟨c,c⟩ decomposition as the Spark
    // kernels so the doubles match bit-for-bit before the final round()
    val kcenter = {
      val steps = (1 until KCenterK).map { i =>
        s"""m$i AS (SELECT s.vec_id,
           |    min(s.xx - 2.0 * list_dot_product(s.v, c.v) + c.xx) AS d
           |  FROM sq s CROSS JOIN ch${i - 1} c GROUP BY s.vec_id),
           |c$i AS MATERIALIZED (SELECT q.vec_id, q.v, q.xx, m.d
           |  FROM m$i m JOIN sq q USING (vec_id)
           |  ORDER BY m.d DESC, q.vec_id LIMIT 1),
           |ch$i AS MATERIALIZED (SELECT vec_id, v, xx FROM ch${i - 1}
           |  UNION ALL SELECT vec_id, v, xx FROM c$i)""".stripMargin
      }.mkString(",\n")
      val sel = (1 until KCenterK)
        .map(i => s"UNION ALL SELECT ${i + 1} AS rank, vec_id, round(d, 6) AS dist FROM c$i")
        .mkString("\n")
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |sq AS MATERIALIZED (SELECT vec_id, v, list_dot_product(v, v) AS xx
         |  FROM e),
         |c0 AS MATERIALIZED (SELECT vec_id, v, xx FROM sq
         |  ORDER BY vec_id LIMIT 1),
         |ch0 AS MATERIALIZED (SELECT vec_id, v, xx FROM c0),
         |$steps
         |SELECT 1 AS rank, vec_id, 0.0 AS dist FROM c0
         |$sel
         |ORDER BY rank""".stripMargin
    }

    // the sketch VALUE is merge-order-dependent by nature; the
    // deterministic contract is the bound check itself (n and the
    // all-true within_bound column) — a broken sketch reds this row
    val quantileApprox =
      """WITH g AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t(p) AS (VALUES ('p50'), ('p90'), ('p99'))
        |SELECT g.lang, t.p, g.n, TRUE AS within_bound
        |FROM g CROSS JOIN t ORDER BY g.lang, t.p""".stripMargin

    // exact distinct count is the deterministic payload; the contract
    // column is what a broken/mis-configured HLL would red
    val distinctApprox =
      s"""WITH t AS (SELECT source, unnest(${Tables.sqlTokens("text")}) AS tok
         |  FROM documents)
         |SELECT source, count(DISTINCT tok)::BIGINT AS n_distinct,
         |  TRUE AS within_bound
         |FROM t GROUP BY source ORDER BY source""".stripMargin

    Map(
      "q_sample_stratified" -> stratified,
      "q_sample_cluster" -> cluster,
      "q_sample_kcenter" -> kcenter,
      "q_corpus_quantiles" -> quantiles,
      // mirror of QuantileOps.madOutliers: nearest-rank p50 twice
      // (identical k = ceil(n/2) arithmetic), integer flag rule
      "q_outliers_mad" ->
        """WITH s AS (SELECT source, count(*) AS n FROM documents
          |    GROUP BY 1),
          |r AS (SELECT doc_id, source, n_chars,
          |    row_number() OVER (PARTITION BY source ORDER BY n_chars)
          |      AS rn FROM documents),
          |med AS (SELECT r.source, r.n_chars AS med FROM r
          |  JOIN s USING (source) WHERE r.rn = (50 * s.n + 99) // 100),
          |dev AS (SELECT d.doc_id, d.source, d.n_chars, med.med,
          |    abs(d.n_chars - med.med) AS dev
          |  FROM documents d JOIN med USING (source)),
          |r2 AS (SELECT source, dev,
          |    row_number() OVER (PARTITION BY source ORDER BY dev) AS rn
          |  FROM dev),
          |mad AS (SELECT r2.source, r2.dev AS mad FROM r2
          |  JOIN s USING (source) WHERE r2.rn = (50 * s.n + 99) // 100)
          |SELECT dev.doc_id, dev.source, dev.n_chars, dev.med,
          |  mad.mad, dev.dev
          |FROM dev JOIN mad USING (source)
          |WHERE dev.dev > 3 * mad.mad
          |ORDER BY dev.doc_id""".stripMargin,
      "q_quantile_approx" -> quantileApprox,
      "q_distinct_approx" -> distinctApprox,
      "q_filter_adaptive" -> adaptive
    )
  }

  /** Bench-only k-center at curation-scale k: the two spec-equal paths
    * ([[graft.ops.SampleOps.kCenterSelect]]) timed head-to-head at
    * k=200 — recompute evaluates i distances per row at step i
    * (O(k²·n/2) kernel work), carry rides a checkpointed running-min
    * column (O(k·n) plus checkpoint materializations). The reference's
    * own k never leaves single digits; these rows record where the
    * crossover actually sits so the carryMinDist default can be chosen
    * from data (BASELINE operating-point note).
    */
  def kCenterRecomputeBench(s: SparkSession, dir: String): DataFrame =
    SampleOps.kCenterSelect(load(s, dir, "embeddings"), "vec_id", "embedding",
        k = 200)
      .select(col("rank"), col("id").as("vec_id"), round(col("dist"), 6).as("dist"))
      .orderBy(col("rank"))

  def kCenterCarryBench(s: SparkSession, dir: String): DataFrame =
    SampleOps.kCenterSelect(load(s, dir, "embeddings"), "vec_id", "embedding",
        k = 200, carryMinDist = true)
      .select(col("rank"), col("id").as("vec_id"), round(col("dist"), 6).as("dist"))
      .orderBy(col("rank"))
}
