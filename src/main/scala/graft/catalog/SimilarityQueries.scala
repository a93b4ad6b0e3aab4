package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Projections
import graft.ops.{DedupOps, SearchOps, SimilarityOps}
import Tables._

/** ANN / vector-similarity queries over the `embeddings` table
  * (V1, J12, embedding near-dup; SURVEY §2.4, LLM-pipeline ops).
  */
object SimilarityQueries {

  private val NearDupThreshold = 0.3
  private val LshBands = 8
  // 8 hyperplanes per band: collision = p^8 (p = 1 - θ/π), which keeps
  // near-dup recall ~0.94 at cosine 0.9 while cutting the candidate rate
  // on uncorrelated vectors from ~50% to ~0.4% (4-plane bands were an
  // accidental half-cartesian at sf0.1)
  private val LshRows = 8
  private val Dims = 64
  // IVF operating point (C=8 cells, probe 6): recall@10 = 0.94 vs brute
  // force at sf0.1. This corpus is isotropic (label column carries no
  // geometric signal; within-label mean cosine ~= cross-label ~= 0), so
  // recall tracks the scanned fraction almost linearly and NO centroid
  // choice beats strided seeding — measured series in BASELINE.md §6.
  // On a clustered real-embedding corpus the same code at nProbe=2
  // recovers the usual IVF advantage; the knob is the deploy-time tune.
  private[catalog] val IvfCells = 8
  private val IvfProbes = 6
  // PQ operating point: 8 subspaces × 16 codes over 64 dims = 4 B of
  // codes per vector (vs 256 B of floats — the 100 TB compression
  // story); codebooks are strided-deterministic so the oracle replays
  // encode + ADC bit-for-bit
  private val PqSub = 8
  private val PqCodes = 16
  // rerank operating point: bigger codebooks + ADC shortlist + exact
  // re-rank — recall@10 0.9 at a 20%-of-corpus shortlist on this
  // isotropic (worst-case) corpus, vs 0.3 for raw ADC top-10 at the
  // same codebooks; recall tracks the scanned fraction (BASELINE §15)
  private val PqCodesRerank = 64
  private val PqShortlist = 100
  // Matryoshka prefix: 16 of 64 dims — the 4× point on the dimension
  // axis, comparable to SQ8's 4× on the precision axis
  private val TruncPrefix = 16

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_ann_bruteforce" -> { (s, dir) =>
      val emb = load(s, dir, "embeddings")
      SimilarityOps.bruteForceTopK(
          emb, "vec_id", "embedding", emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_ivf" -> { (s, dir) =>
      val emb = load(s, dir, "embeddings")
      val (assigned, centroids) =
        SimilarityOps.ivfIndex(emb, "vec_id", "embedding", numCells = IvfCells)
      SimilarityOps.ivfTopK(assigned, "vec_id", "embedding", centroids,
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10, nProbe = IvfProbes)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_pq" -> { (s, dir) =>
      // product-quantized ANN: codebooks learned (strided), corpus
      // encoded to 8 codes/vector, queries scored by ADC table lookups
      val emb = load(s, dir, "embeddings")
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding", PqSub, PqCodes)
      val codes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb)
      SimilarityOps.pqTopK(codes, "vec_id",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", cb, k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("adc"), 6).as("adc"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_pq_rerank" -> { (s, dir) =>
      // the deployable PQ shape: ADC shortlist over codes, exact
      // cosine re-rank of the shortlist only
      val emb = load(s, dir, "embeddings")
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
        PqSub, PqCodesRerank)
      val codes = SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb)
      SimilarityOps.pqTopKReranked(codes, "vec_id", emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", cb,
          k = 10, shortlist = PqShortlist)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_ivfpq" -> { (s, dir) =>
      // the composed 100-TB serving scan: IVF routing bounds WHAT is
      // probed (6/8 cells), PQ/ADC bounds what a probe READS (~64×
      // fewer bytes), exact re-rank of the shortlist restores order —
      // strided codebooks/centroids so the whole composition replays
      // bit-for-bit in SQL (the kmeans-codebook production variant is
      // the q_ann_ivfpq_kmeans bench row)
      val emb = load(s, dir, "embeddings")
      val (assigned, centroids) =
        SimilarityOps.ivfIndex(emb, "vec_id", "embedding", numCells = IvfCells)
      val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding",
        PqSub, PqCodesRerank)
      val codes = SimilarityOps.pqEncode(assigned, "vec_id", "embedding", cb,
        passthrough = Seq("cell"))
      SimilarityOps.pqTopKIvf(codes, "vec_id", emb, "vec_id", "embedding",
          centroids, emb.filter(col("vec_id") < 5), "vec_id", "embedding", cb,
          k = 10, nProbe = IvfProbes, shortlist = PqShortlist)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_sq8" -> { (s, dir) =>
      // SQ8 scalar quantization: per-dim min/max bounds over the corpus,
      // one byte-range code per dimension (4× smaller than float32, far
      // higher fidelity than PQ), asymmetric exact-query-vs-reconstructed
      // cosine — the first compression rung of a 100-TB serving scan
      val emb = load(s, dir, "embeddings")
      val bounds = SimilarityOps.sq8Bounds(emb, "embedding")
      val codes = SimilarityOps.sq8Encode(emb, "vec_id", "embedding", bounds)
      SimilarityOps.sq8TopK(codes, "vec_id",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", bounds, k = 10)
        .select(col("query_id"), col("neighbor_id"),
          round(col("sq8_cosine"), 6).as("sq8_cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_binary" -> { (s, dir) =>
      // binary quantization, the 32× end of the compression ladder:
      // per-dim 1e-6-quantized mean thresholds (engine-portable), sign
      // bits packed into longs, Hamming shortlist + exact cosine re-rank
      val emb = load(s, dir, "embeddings")
      val th = SimilarityOps.binaryThresholds(emb, "embedding")
      val codes = SimilarityOps.binaryEncode(emb, "vec_id", "embedding", th)
      SimilarityOps.binaryTopKReranked(codes, "vec_id", emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding", th,
          k = 10, shortlist = PqShortlist)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_ann_truncated" -> { (s, dir) =>
      // Matryoshka / truncated-dim ANN: coarse cosine over the first 16
      // of 64 dims (4× fewer bytes, zero trained artifact), exact
      // full-dim re-rank of the shortlist
      val emb = load(s, dir, "embeddings")
      SimilarityOps.truncatedTopKReranked(emb, "vec_id", "embedding",
          emb.filter(col("vec_id") < 5), "vec_id", "embedding",
          prefixDims = TruncPrefix, k = 10, shortlist = PqShortlist)
        .select(col("query_id"), col("neighbor_id"),
          round(col("cosine"), 6).as("cosine"),
          col("rank").cast("long").as("rank"))
        .orderBy(col("query_id"), col("rank"))
    },
    "q_recon_candidates" -> { (s, dir) =>
      // J12 — reconciliation-candidate join: top-10 per new fact with
      // cosine >= threshold, then dedup across facts (first fact wins,
      // reference search/vector.py:294-348)
      val emb = load(s, dir, "embeddings")
      val perFact = SimilarityOps.bruteForceTopK(
          emb, "vec_id", "embedding", emb.filter(col("vec_id") < 20), "vec_id", "embedding", k = 10)
        .filter(col("cosine") >= NearDupThreshold)
      val w = Window.partitionBy(col("neighbor_id")).orderBy(col("query_id").asc)
      perFact
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("query_id"), col("neighbor_id"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("query_id"), col("neighbor_id"))
    },
    "q_semdedup" -> { (s, dir) =>
      // SemDeDup: IVF-cell clustering + within-cell greedy exemplar
      // choice; θ=0.5 (the near-dup band of this corpus — 0.3 is the
      // stress figure, 0.9 the planted-twin design point)
      val emb = load(s, dir, "embeddings")
      SimilarityOps.semanticDedup(emb, "vec_id", "embedding",
          numCells = IvfCells, threshold = 0.5)
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          col("dup_of"), col("kept"))
        .orderBy(col("vec_id"))
    },
    "q_proto_prune" -> { (s, dir) =>
      // D4's density-pruning stage: drop the 20% most prototypical
      // vectors per IVF cell (cosine to the assigned centroid), keep
      // the informative lower-density mass
      val emb = load(s, dir, "embeddings")
      SimilarityOps.prototypePrune(emb, "vec_id", "embedding",
          numCells = IvfCells, dropFraction = 0.2)
        .select(col("vec_id"), col("cell").cast("long").as("cell"),
          round(col("proto_sim"), 6).as("proto_sim"))
        .orderBy(col("vec_id"))
    },
    "q_emb_neardup_exact" -> { (s, dir) =>
      val emb = load(s, dir, "embeddings")
      DedupOps.embeddingNearDupPairs(emb, "vec_id", "embedding",
          threshold = NearDupThreshold, dims = Dims, bands = 0)
        .select(col("doc_a"), col("doc_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_emb_neardup_lsh" -> { (s, dir) =>
      val emb = load(s, dir, "embeddings")
      DedupOps.embeddingNearDupPairs(emb, "vec_id", "embedding",
          threshold = NearDupThreshold, dims = Dims, bands = LshBands, rowsPerBand = LshRows)
        .select(col("doc_a"), col("doc_b"), round(col("cosine"), 6).as("cosine"))
        .orderBy(col("doc_a"), col("doc_b"))
    },
    "q_pair_mining" -> { (s, dir) =>
      // contrastive triplets from the corpus's own near-dup structure:
      // positive = strongest LSH-confirmed partner, negative =
      // hash-picked vector rejected against the FULL partner set
      val emb = load(s, dir, "embeddings")
      SimilarityOps.minePairs(emb, "vec_id", "embedding",
          threshold = NearDupThreshold, dims = Dims,
          bands = LshBands, rowsPerBand = LshRows)
        .select(col("anchor"), col("positive"),
          round(col("pos_cos"), 6).as("pos_cos"),
          col("negative"), round(col("neg_cos"), 6).as("neg_cos"))
        .orderBy(col("anchor"))
    },
    "q_cosine_topk" -> { (s, dir) =>
      // V1 — cosine top-k against a constant query vector (the stored
      // embedding of vec_id = 0, collected once driver-side)
      val emb = load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      SearchOps.cosineTopK(emb, "embedding", "vec_id", q, k = 20)
        .select(col("vec_id"), round(col("score"), 6).as("score"))
        .orderBy(col("score").desc, col("vec_id"))
    },
    "q_mmr" -> { (s, dir) =>
      // V4 — MMR diversity (greedy, driver-side; rows-only check: the
      // sequential selection isn't reasonably expressible in SQL)
      val emb = load(s, dir, "embeddings")
      val q = emb.filter(col("vec_id") === 0)
        .select(col("embedding")).head().getSeq[Float](0).toArray
      SearchOps.mmr(emb, "embedding", "vec_id", q, k = 10, lambda = 0.5)
        .select(col("vec_id"), round(col("score"), 6).as("score"), col("mmr_rank"))
        .orderBy(col("mmr_rank"))
    }
  )

  /** Bench-only variant of q_ann_ivf on the Lloyd-refined index
    * (VERDICT r4 #1): same cells/probes operating point, recall measured
    * against q_ann_bruteforce by [[graft.Bench]]. No oracle — the
    * iterative recentering is not worth a 5-iteration SQL replay; recall
    * parity with the strided index is the assertion that matters
    * (IvfSpec + bench telemetry).
    */
  def ivfKMeansBench(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
    val (assigned, centroids) =
      SimilarityOps.ivfIndexKMeans(emb, "vec_id", "embedding", numCells = IvfCells)
    SimilarityOps.ivfTopK(assigned, "vec_id", "embedding", centroids,
        emb.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10, nProbe = IvfProbes)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Bench-only composed IVF×PQ path — the full production ANN layout:
    * k-means PQ codebooks, IVF routing (6/8 probes), ADC over the
    * cell-partitioned code table, shortlist-100 exact re-rank. No
    * oracle — each half is oracle-gated separately (q_ann_ivf,
    * q_ann_pq_rerank); the composition's recall is recorded by
    * [[graft.Bench]] in the untimed telemetry section.
    */
  def ivfPqBench(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
    val (assigned, centroids) =
      SimilarityOps.ivfIndex(emb, "vec_id", "embedding", numCells = IvfCells)
    val cb = SimilarityOps.pqCodebooksKMeans(emb, "vec_id", "embedding",
      PqSub, PqCodesRerank)
    val codes = SimilarityOps.pqEncode(assigned, "vec_id", "embedding", cb,
      passthrough = Seq("cell"))
    SimilarityOps.pqTopKIvf(codes, "vec_id", emb, "vec_id", "embedding",
        centroids, emb.filter(col("vec_id") < 5), "vec_id", "embedding", cb,
        k = 10, nProbe = IvfProbes, shortlist = PqShortlist)
      .select(col("query_id"), col("neighbor_id"),
        round(col("cosine"), 6).as("cosine"), col("rank").cast("long").as("rank"))
      .orderBy(col("query_id"), col("rank"))
  }

  /** Bench-only large-k MMR: the distributed carry path
    * ([[SimilarityOps]]'s driver loop is spec-equal, FixtureSpec) at a
    * curation-scale k=100 over a 400-candidate pool — the regime where
    * the driver loop's k·fetchK pairwise evaluations and fetchK-row
    * collect stop being free. No oracle: the sequential selection is
    * not SQL-expressible; equality with the oracle-adjacent driver loop
    * is the correctness story.
    */
  def mmrLargeKBench(s: SparkSession, dir: String): DataFrame = {
    val emb = load(s, dir, "embeddings")
    val q = emb.filter(col("vec_id") === 0)
      .select(col("embedding")).head().getSeq[Float](0).toArray
    graft.ops.SearchOps.mmrIterative(emb, "embedding", "vec_id", q,
        k = 100, lambda = 0.5)
      .select(col("vec_id"), round(col("score"), 6).as("score"), col("mmr_rank"))
      .orderBy(col("mmr_rank"))
  }

  // ---- design-point near-dup bench (VERDICT r4 #4) -------------------
  // The synthetic corpus is isotropic: its maximum off-diagonal cosine
  // is 0.60, so the θ=0.9 near-dup regime (the regime the reference's
  // vector search is designed for, search/vector.py) has NO naturally
  // occurring pairs to measure recall on. Plant them: every vector gets
  // one perturbed twin at vec_id + DesignDupOffset with deterministic
  // hash-noise of relative L2 0.4 → cosine(v, v') ≈ 0.93 ± 0.01. With
  // 8 bands × 8 hyperplanes, band-collision odds at cosine 0.93 are
  // (1 − θ/π)^8 ≈ 0.36 per band → expected recall 1 − 0.64^8 ≈ 0.97.
  private val DesignDupOffset = 1000000L
  private val DesignNoiseRel = 0.4
  private val DesignThreshold = 0.9

  /** Original corpus ∪ planted perturbed twins, embeddings as double. */
  private def designCorpus(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val emb = load(s, dir, "embeddings")
      .filter(col("embedding").isNotNull)
      .select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("embedding"))
    // per-(row, pos) noise in [-1, 1] from xxhash64 — reproducible across
    // runs and engines, no RNG state
    val noise = transform(col("embedding"),
      (_, i) => (pmod(xxhash64(col("vec_id"), i), lit(2001L)) - lit(1000L))
        .cast("double") / 1000.0)
    val twins = emb
      .withColumn("g", noise)
      .withColumn("nv", VectorFunctions.l2Norm(col("embedding")))
      .withColumn("ng", VectorFunctions.l2Norm(col("g")))
      .select(
        (col("vec_id") + DesignDupOffset).as("vec_id"),
        zip_with(col("embedding"), col("g"),
          (x, n) => x + lit(DesignNoiseRel) * col("nv") * n / col("ng")).as("embedding"))
    emb.unionByName(twins)
  }

  /** Bench-only: banded sign-LSH near-dup pairs at the θ=0.9 design
    * point over the planted corpus. Recall vs [[designTruth]] is the
    * telemetry [[graft.Bench]] records as q_emb_neardup_lsh_design.
    */
  def nearDupDesignBench(s: SparkSession, dir: String): DataFrame =
    DedupOps.embeddingNearDupPairs(designCorpus(s, dir), "vec_id", "embedding",
        threshold = DesignThreshold, dims = Dims, bands = LshBands, rowsPerBand = LshRows)
      .select(col("doc_a"), col("doc_b"), round(col("cosine"), 6).as("cosine"))
      .orderBy(col("doc_a"), col("doc_b"))

  // ---- IVF append staleness telemetry (VERDICT r6 #6) ----------------
  // appendIvfPartitioned's scaladoc hands the caller a re-cluster knob
  // ("rewrite when recall telemetry sags") with no number behind it.
  // These three recall-section queries put the number there: index the
  // BASE corpus with Lloyd-refined centroids, append the planted twins
  // through the real partitioned-parquet append path against those now-
  // STALE centroids, and compare probe recall@10 on the grown corpus
  // against (a) a fresh re-cluster of the grown corpus and (b) exact
  // brute force (the truth both recalls are measured against).

  /** Grown-corpus exact truth: brute-force top-10 for the probe queries
    * over base ∪ twins.
    */
  def ivfAppendBruteforceBench(s: SparkSession, dir: String): DataFrame = {
    val corpus = designCorpus(s, dir)
    SimilarityOps.bruteForceTopK(corpus, "vec_id", "embedding",
        corpus.filter(col("vec_id") < 5), "vec_id", "embedding", k = 10)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Probe the STALE-append index: centroids fit on the base corpus
    * only; twins arrive via [[SimilarityOps.appendIvfPartitioned]] into
    * the cell-partitioned parquet layout (the real 100 TB append path,
    * disk round-trip included) and are never re-clustered.
    */
  def ivfAppendStaleBench(s: SparkSession, dir: String): DataFrame = {
    val corpus = designCorpus(s, dir).localCheckpoint()
    val base = corpus.filter(col("vec_id") < DesignDupOffset)
    val twins = corpus.filter(col("vec_id") >= DesignDupOffset)
    val (baseAssigned, centroids) =
      SimilarityOps.ivfIndexKMeans(base, "vec_id", "embedding", numCells = IvfCells)
    val path = System.getProperty("java.io.tmpdir") +
      s"/graft_ivf_append_${s.sparkContext.applicationId}"
    SimilarityOps.writeIvfPartitioned(baseAssigned, path)
    SimilarityOps.appendIvfPartitioned(twins, "vec_id", "embedding", centroids, path)
    SimilarityOps.ivfTopK(s.read.parquet(path), "vec_id", "embedding", centroids,
        base.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nProbe = IvfProbes)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Probe the FRESH re-cluster of the grown corpus — the expensive
    * alternative the staleness telemetry is weighed against.
    */
  def ivfAppendFreshBench(s: SparkSession, dir: String): DataFrame = {
    val corpus = designCorpus(s, dir).localCheckpoint()
    val (assigned, centroids) =
      SimilarityOps.ivfIndexKMeans(corpus, "vec_id", "embedding", numCells = IvfCells)
    SimilarityOps.ivfTopK(assigned, "vec_id", "embedding", centroids,
        corpus.filter(col("vec_id") < 5), "vec_id", "embedding",
        k = 10, nProbe = IvfProbes)
      .select(col("query_id"), col("neighbor_id"))
  }

  /** Exact ground truth at the design point: the planted (v, twin) pairs
    * whose true cosine clears the threshold (all of them, by
    * construction — asserted ≥ θ in the join below, not assumed). The
    * original corpus contributes no ≥0.9 pairs (max 0.60) and
    * twin–other-twin cosines inherit the originals' isotropy, so the
    * planted pairs ARE the complete truth set.
    */
  def designTruth(s: SparkSession, dir: String): DataFrame = {
    import graft.functions.VectorFunctions
    val corpus = designCorpus(s, dir)
    val orig = corpus.filter(col("vec_id") < DesignDupOffset)
      .select(col("vec_id").as("doc_a"), col("embedding").as("ea"))
    val twin = corpus.filter(col("vec_id") >= DesignDupOffset)
      .select((col("vec_id") - DesignDupOffset).as("doc_a"),
        col("vec_id").as("doc_b"), col("embedding").as("eb"))
    orig.join(twin, "doc_a")
      .filter(VectorFunctions.cosineSimilarity(col("ea"), col("eb")) >= DesignThreshold)
      .select(col("doc_a"), col("doc_b"))
  }

  /** DuckDB cosine of two DOUBLE[] expressions (mirror of
    * VectorFunctions.cosineSimilarity incl. the zero-norm guard). */
  private[catalog] def cos(a: String, b: String): String =
    s"""CASE WHEN sqrt(list_dot_product($a,$a)) = 0 OR sqrt(list_dot_product($b,$b)) = 0 THEN 0.0
       | ELSE list_dot_product($a,$b) / (sqrt(list_dot_product($a,$a)) * sqrt(list_dot_product($b,$b)))
       | END""".stripMargin.replaceAll("\n", " ")

  def oracle: Map[String, String] = {
    val bruteforce =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${cos("q.v", "c.v")} AS c
         |      FROM e q JOIN e c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank
         |      FROM s)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    val ivf =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS cv
         |         FROM (SELECT e.vec_id, e.v
         |               FROM e CROSS JOIN (SELECT greatest(1, count(*) // $IvfCells) AS stride FROM e) s
         |               WHERE e.vec_id % s.stride = 0
         |               ORDER BY e.vec_id LIMIT $IvfCells)),
         |assigned AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, cent.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent) WHERE rn = 1),
         |routed AS (
         |  SELECT query_id, qv, cell FROM (
         |    SELECT e.vec_id AS query_id, e.v AS qv, cent.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent WHERE e.vec_id < 5) WHERE rn <= $IvfProbes),
         |scored AS (
         |  SELECT routed.query_id, a.vec_id AS neighbor_id, ${cos("routed.qv", "a.v")} AS c
         |  FROM routed JOIN assigned a ON routed.cell = a.cell AND routed.query_id <> a.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank FROM scored)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    // PQ replay: same strided codebook rows as the IVF centroid trick,
    // per-(vector, subspace) argmin with (dist asc, code asc) ties —
    // identical to Spark's array_min struct ordering — and a fixed
    // subspace-order ADC sum via the (m, code)-ordered distance list,
    // matching Spark's expression-reduce order exactly
    def pqCtes(numCodes: Int): String = {
      val sd = Dims / PqSub
      def l2(a: String, b: String) =
        s"""list_aggregate([ ($a[mm.m*$sd+j] - $b[mm.m*$sd+j])
           | * ($a[mm.m*$sd+j] - $b[mm.m*$sd+j]) for j in range(1, ${sd + 1})],
           | 'sum')""".stripMargin.replaceAll("\n", "")
      s"""e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cb AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS code, v AS cv
         |       FROM (SELECT e.vec_id, e.v
         |             FROM e CROSS JOIN (SELECT greatest(1, count(*) // $numCodes) AS stride FROM e) s
         |             WHERE e.vec_id % s.stride = 0
         |             ORDER BY e.vec_id LIMIT $numCodes)),
         |mm AS (SELECT unnest(range(0, $PqSub)) AS m),
         |codes AS (
         |  SELECT vec_id, m, code FROM (
         |    SELECT e.vec_id, mm.m, c.code,
         |      row_number() OVER (PARTITION BY e.vec_id, mm.m
         |        ORDER BY ${l2("e.v", "c.cv")} ASC, c.code ASC) AS rn
         |    FROM e, mm, cb c) WHERE rn = 1),
         |cvl AS (SELECT vec_id, list(code ORDER BY m) AS cl FROM codes GROUP BY vec_id),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
         |dt AS (SELECT q.query_id, mm.m, c.code, ${l2("q.qv", "c.cv")} AS d
         |  FROM q, mm, cb c),
         |dtl AS (SELECT query_id, list(d ORDER BY m, code) AS dl FROM dt GROUP BY query_id),
         |scored AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_aggregate([ q.dl[m*$numCodes + c.cl[m+1] + 1]
         |      for m in range(0, $PqSub) ], 'sum') AS adc
         |  FROM dtl q, cvl c WHERE q.query_id <> c.vec_id)""".stripMargin
    }
    val pq =
      s"""WITH ${pqCtes(PqCodes)},
         |r AS (SELECT query_id, neighbor_id, adc,
         |      row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rank
         |      FROM scored)
         |SELECT query_id, neighbor_id, round(adc, 6) AS adc, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin
    // shortlist by ADC, exact-cosine re-rank of the shortlist only —
    // the deployable PQ shape the Spark path implements
    val pqRerank =
      s"""WITH ${pqCtes(PqCodesRerank)},
         |short AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rn
         |  FROM scored) WHERE rn <= $PqShortlist),
         |ex AS (SELECT s.query_id, s.neighbor_id, ${cos("qe.v", "ne.v")} AS c
         |  FROM short s JOIN e qe ON s.query_id = qe.vec_id
         |  JOIN e ne ON s.neighbor_id = ne.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank
         |      FROM ex)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    // composed IVF × PQ replay: the pq_rerank CTEs (strided codebooks,
    // fixed-order ADC) plus the ivf CTEs (strided centroids, 6/8 probe
    // routing); ADC scoring is restricted to vectors in probed cells
    // BEFORE the shortlist — the unused full-cross `scored` CTE from
    // pqCtes is never referenced, so DuckDB doesn't evaluate it
    val ivfpq =
      s"""WITH ${pqCtes(PqCodesRerank)},
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS cv
         |         FROM (SELECT e.vec_id, e.v
         |               FROM e CROSS JOIN (SELECT greatest(1, count(*) // $IvfCells) AS stride FROM e) s
         |               WHERE e.vec_id % s.stride = 0
         |               ORDER BY e.vec_id LIMIT $IvfCells)),
         |acell AS (
         |  SELECT vec_id, cell FROM (
         |    SELECT e.vec_id, cent.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent) WHERE rn = 1),
         |routed AS (
         |  SELECT query_id, cell FROM (
         |    SELECT e.vec_id AS query_id, cent.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent WHERE e.vec_id < 5) WHERE rn <= $IvfProbes),
         |iscored AS (
         |  SELECT q.query_id, c.vec_id AS neighbor_id,
         |    list_aggregate([ q.dl[m*$PqCodesRerank + c.cl[m+1] + 1]
         |      for m in range(0, $PqSub) ], 'sum') AS adc
         |  FROM dtl q JOIN routed r ON r.query_id = q.query_id
         |  JOIN acell a ON a.cell = r.cell
         |  JOIN cvl c ON c.vec_id = a.vec_id
         |  WHERE q.query_id <> c.vec_id),
         |short AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY adc ASC, neighbor_id ASC) AS rn
         |  FROM iscored) WHERE rn <= $PqShortlist),
         |ex AS (SELECT s.query_id, s.neighbor_id, ${cos("qe.v", "ne.v")} AS c
         |  FROM short s JOIN e qe ON s.query_id = qe.vec_id
         |  JOIN e ne ON s.neighbor_id = ne.vec_id),
         |rr AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank
         |      FROM ex)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank::BIGINT AS rank
         |FROM rr WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    // SQ8 replay: per-dim min/max bounds, half-up byte codes, in-order
    // reconstruction xhat = mn + code·(span/255) — every operation order
    // mirrors GraftHash.sq8Codes/sq8Cosine (round is half-away-from-zero
    // on both sides for the nonnegative argument), so the doubles match
    // bit-for-bit before the round(…, 6)
    val sq8 =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |dd AS (SELECT unnest(range(1, ${Dims + 1})) AS d),
         |b AS (SELECT dd.d, min(e.v[dd.d]) AS mn, max(e.v[dd.d]) AS mx
         |      FROM e, dd GROUP BY dd.d),
         |cd AS (SELECT e.vec_id, b.d,
         |    CASE WHEN b.mx - b.mn <= 0 THEN 0
         |         ELSE least(255, greatest(0,
         |           CAST(round(((e.v[b.d] - b.mn) / (b.mx - b.mn)) * 255.0) AS INTEGER))) END AS code
         |  FROM e, b),
         |xh AS (SELECT cd.vec_id,
         |    list(b.mn + cd.code * ((b.mx - b.mn) / 255.0) ORDER BY cd.d) AS xv
         |  FROM cd JOIN b ON cd.d = b.d GROUP BY cd.vec_id),
         |s AS (SELECT q.vec_id AS query_id, x.vec_id AS neighbor_id, ${cos("q.v", "x.xv")} AS c
         |      FROM e q JOIN xh x ON q.vec_id < 5 AND q.vec_id <> x.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank FROM s)
         |SELECT query_id, neighbor_id, round(c, 6) AS sq8_cosine, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    // binary-quantization replay: thresholds are floor(µ·1e6 + 0.5)/1e6
    // on BOTH sides — the quantization absorbs any last-ulp difference
    // in the mean's summation order between engines, so the sign bits
    // (and hence Hamming, shortlist, re-rank) are deterministic; the
    // bit-unpacked 0/1 join replays the packed popcount exactly
    val bin =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |dd AS (SELECT unnest(range(1, ${Dims + 1})) AS d),
         |th AS (SELECT dd.d, floor(avg(e.v[dd.d]) * 1000000 + 0.5) / 1000000 AS t
         |       FROM e, dd GROUP BY dd.d),
         |bits AS (SELECT e.vec_id, th.d,
         |    CASE WHEN e.v[th.d] > th.t THEN 1 ELSE 0 END AS b
         |  FROM e, th),
         |ham AS (
         |  SELECT qb.vec_id AS query_id, cb.vec_id AS neighbor_id,
         |    sum(CASE WHEN qb.b <> cb.b THEN 1 ELSE 0 END) AS h
         |  FROM bits qb JOIN bits cb ON qb.d = cb.d
         |  WHERE qb.vec_id < 5 AND qb.vec_id <> cb.vec_id
         |  GROUP BY qb.vec_id, cb.vec_id),
         |short AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY h ASC, neighbor_id ASC) AS rn
         |  FROM ham) WHERE rn <= $PqShortlist),
         |ex AS (SELECT s.query_id, s.neighbor_id, ${cos("qe.v", "ne.v")} AS c
         |  FROM short s JOIN e qe ON s.query_id = qe.vec_id
         |  JOIN e ne ON s.neighbor_id = ne.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank FROM ex)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    // truncated-dim replay: DuckDB's 1-based inclusive list slice picks
    // the same prefix the Spark slice(emb, 1, n) does; coarse and exact
    // cosines both run the fixed-order accumulation cos() mirrors
    val trunc =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |pe AS (SELECT vec_id, v[1:$TruncPrefix] AS pv FROM e),
         |coarse AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${cos("q.pv", "c.pv")} AS cc
         |  FROM pe q JOIN pe c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
         |short AS (SELECT query_id, neighbor_id FROM (
         |  SELECT query_id, neighbor_id,
         |    row_number() OVER (PARTITION BY query_id ORDER BY cc DESC, neighbor_id ASC) AS rn
         |  FROM coarse) WHERE rn <= $PqShortlist),
         |ex AS (SELECT s.query_id, s.neighbor_id, ${cos("qe.v", "ne.v")} AS c
         |  FROM short s JOIN e qe ON s.query_id = qe.vec_id
         |  JOIN e ne ON s.neighbor_id = ne.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank FROM ex)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine, rank::BIGINT AS rank
         |FROM r WHERE rank <= 10 ORDER BY query_id, rank""".stripMargin

    val recon =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, ${cos("q.v", "c.v")} AS c
         |      FROM e q JOIN e c ON q.vec_id < 20 AND q.vec_id <> c.vec_id),
         |r AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY query_id ORDER BY c DESC, neighbor_id ASC) AS rank FROM s),
         |topk AS (SELECT * FROM r WHERE rank <= 10 AND c >= $NearDupThreshold),
         |dedup AS (SELECT query_id, neighbor_id, c,
         |      row_number() OVER (PARTITION BY neighbor_id ORDER BY query_id ASC) AS rn FROM topk)
         |SELECT query_id, neighbor_id, round(c, 6) AS cosine
         |FROM dedup WHERE rn = 1 ORDER BY query_id, neighbor_id""".stripMargin

    val protoPrune =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS cv
         |         FROM (SELECT e.vec_id, e.v
         |               FROM e CROSS JOIN (SELECT greatest(1, count(*) // $IvfCells) AS stride FROM e) s
         |               WHERE e.vec_id % s.stride = 0
         |               ORDER BY e.vec_id LIMIT $IvfCells)),
         |assigned AS (
         |  SELECT vec_id, cell, c FROM (
         |    SELECT e.vec_id, cent.cell, ${cos("e.v", "cent.cv")} AS c,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent) WHERE rn = 1),
         |counts AS (SELECT cell, count(*) AS n FROM assigned GROUP BY cell),
         |r AS (SELECT vec_id, cell, c,
         |      row_number() OVER (PARTITION BY cell ORDER BY c DESC, vec_id ASC) AS rn
         |  FROM assigned)
         |SELECT r.vec_id, r.cell::BIGINT AS cell, round(r.c, 6) AS proto_sim
         |FROM r JOIN counts USING (cell)
         |WHERE r.rn > ceil(0.2 * counts.n)
         |ORDER BY r.vec_id""".stripMargin

    val semdedup =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |cent AS (SELECT row_number() OVER (ORDER BY vec_id) AS cell, v AS cv
         |         FROM (SELECT e.vec_id, e.v
         |               FROM e CROSS JOIN (SELECT greatest(1, count(*) // $IvfCells) AS stride FROM e) s
         |               WHERE e.vec_id % s.stride = 0
         |               ORDER BY e.vec_id LIMIT $IvfCells)),
         |assigned AS (
         |  SELECT vec_id, v, cell FROM (
         |    SELECT e.vec_id, e.v, cent.cell,
         |      row_number() OVER (PARTITION BY e.vec_id ORDER BY ${cos("e.v", "cent.cv")} DESC, cent.cell ASC) AS rn
         |    FROM e CROSS JOIN cent) WHERE rn = 1),
         |p AS (SELECT b.vec_id AS vid, min(a.vec_id) AS dup_of
         |      FROM assigned a JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
         |      WHERE ${cos("a.v", "b.v")} >= 0.5 GROUP BY b.vec_id)
         |SELECT s.vec_id, s.cell::BIGINT AS cell, p.dup_of,
         |  p.dup_of IS NULL AS kept
         |FROM assigned s LEFT JOIN p ON s.vec_id = p.vid
         |ORDER BY s.vec_id""".stripMargin

    val exact =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT a.vec_id AS doc_a, b.vec_id AS doc_b, round(${cos("a.v", "b.v")}, 6) AS cosine
         |FROM e a JOIN e b ON a.vec_id < b.vec_id
         |WHERE ${cos("a.v", "b.v")} >= $NearDupThreshold
         |ORDER BY doc_a, doc_b""".stripMargin

    // LSH oracle replicates the banded bucketing with the same ±1
    // hyperplane literals the Spark side embeds
    val w = Projections.signWeights(LshBands, LshRows, Dims)
    def wLit(b: Int, p: Int): String = w(b)(p).mkString("[", ",", "]")
    val bandSelects = (0 until LshBands).map { b =>
      val keyExpr = (0 until LshRows).map { p =>
        s"(CASE WHEN list_dot_product(v, ${wLit(b, p)}::DOUBLE[]) >= 0 THEN ${1L << p} ELSE 0 END)"
      }.mkString(" + ")
      s"SELECT vec_id AS doc, v, $b AS band, ($keyExpr)::BIGINT AS key FROM e"
    }.mkString(" UNION ALL ")
    val lsh =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |banded AS ($bandSelects),
         |pairs AS (SELECT DISTINCT l.doc AS doc_a, r.doc AS doc_b
         |          FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc < r.doc)
         |SELECT p.doc_a, p.doc_b, round(${cos("a.v", "b.v")}, 6) AS cosine
         |FROM pairs p JOIN e a ON p.doc_a = a.vec_id JOIN e b ON p.doc_b = b.vec_id
         |WHERE ${cos("a.v", "b.v")} >= $NearDupThreshold
         |ORDER BY doc_a, doc_b""".stripMargin

    // mirror of SimilarityOps.minePairs over the same banded pair CTE:
    // positive = max-cosine partner (tie → smaller id), negative = first
    // md5-bucket candidate j that is neither the anchor nor any partner
    val pairMining =
      s"""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |banded AS ($bandSelects),
         |pr AS (SELECT DISTINCT l.doc AS doc_a, r.doc AS doc_b
         |       FROM banded l JOIN banded r ON l.band = r.band AND l.key = r.key AND l.doc < r.doc),
         |pc AS (SELECT p.doc_a, p.doc_b, ${cos("a.v", "b.v")} AS cosine
         |       FROM pr p JOIN e a ON p.doc_a = a.vec_id JOIN e b ON p.doc_b = b.vec_id
         |       WHERE ${cos("a.v", "b.v")} >= $NearDupThreshold),
         |sym AS (SELECT doc_a AS anchor, doc_b AS partner, cosine FROM pc
         |        UNION ALL SELECT doc_b, doc_a, cosine FROM pc),
         |pos AS (SELECT anchor, partner AS positive, cosine AS pos_cos,
         |        row_number() OVER (PARTITION BY anchor
         |          ORDER BY cosine DESC, partner) AS rn FROM sym),
         |nn AS (SELECT count(*)::UBIGINT AS n FROM embeddings),
         |cand AS (SELECT p.anchor, p.positive, p.pos_cos, u.j,
         |    ((('0x' || substr(md5(p.anchor::VARCHAR || '-' || u.j::VARCHAR), 1, 8))::UBIGINT
         |      % (SELECT n FROM nn))::BIGINT) AS cand
         |  FROM pos p, LATERAL (SELECT unnest(range(0, 8)) AS j) u
         |  WHERE p.rn = 1),
         |neg AS (SELECT c.anchor, c.positive, c.pos_cos, c.cand,
         |    row_number() OVER (PARTITION BY c.anchor ORDER BY c.j) AS rn
         |  FROM cand c
         |  LEFT JOIN (SELECT DISTINCT anchor, partner FROM sym) s
         |    ON c.anchor = s.anchor AND c.cand = s.partner
         |  WHERE s.anchor IS NULL AND c.cand <> c.anchor)
         |SELECT g.anchor, g.positive, round(g.pos_cos, 6) AS pos_cos,
         |  g.cand AS negative, round(${cos("va.v", "vn.v")}, 6) AS neg_cos
         |FROM neg g JOIN e va ON g.anchor = va.vec_id
         |JOIN e vn ON g.cand = vn.vec_id
         |WHERE g.rn = 1 ORDER BY g.anchor""".stripMargin

    val topk =
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |s AS (SELECT vec_id, ${cos("v", "(SELECT qv FROM q)")} AS score FROM e)
         |SELECT vec_id, round(score, 6) AS score FROM s
         |ORDER BY score DESC, vec_id LIMIT 20""".stripMargin

    // Greedy MMR as a recursive CTE: `sel` carries the chosen-id list,
    // each step's LATERAL picks argmax(λ·sim − (1−λ)·max cos to chosen)
    // with the same lower-id tie-break as SearchOps.mmr. Candidate pool =
    // top-(4k) by cosine, matching mmr's default fetchK.
    val mmrK = 10
    val mmrFetch = 4 * mmrK
    val mmr =
      s"""WITH RECURSIVE
         |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 0),
         |scored AS (SELECT e.vec_id, e.v, ${cos("e.v", "(SELECT qv FROM q)")} AS sim FROM e),
         |cand AS (SELECT * FROM scored ORDER BY sim DESC, vec_id ASC LIMIT $mmrFetch),
         |pairc AS (SELECT a.vec_id AS ia, b.vec_id AS ib, ${cos("a.v", "b.v")} AS pc
         |          FROM cand a JOIN cand b ON a.vec_id <> b.vec_id),
         |sel AS (
         |  SELECT 1 AS mmr_rank, vec_id, sim, [vec_id] AS chosen
         |  FROM (SELECT vec_id, sim FROM cand ORDER BY 0.5*sim DESC, vec_id ASC LIMIT 1)
         |  UNION ALL
         |  SELECT s.mmr_rank + 1, p.vec_id, p.sim, list_append(s.chosen, p.vec_id)
         |  FROM sel s JOIN LATERAL (
         |    SELECT c.vec_id, c.sim
         |    FROM cand c
         |    WHERE NOT list_contains(s.chosen, c.vec_id)
         |    ORDER BY 0.5*c.sim - 0.5*coalesce((SELECT max(pr.pc) FROM pairc pr
         |        WHERE pr.ia = c.vec_id AND list_contains(s.chosen, pr.ib)), 0.0) DESC,
         |      c.vec_id ASC
         |    LIMIT 1
         |  ) p ON true
         |  WHERE s.mmr_rank < $mmrK
         |)
         |SELECT vec_id, round(sim, 6) AS score, mmr_rank::INTEGER AS mmr_rank
         |FROM sel ORDER BY mmr_rank""".stripMargin

    Map(
      "q_ann_bruteforce" -> bruteforce,
      "q_ann_ivf" -> ivf,
      "q_ann_pq" -> pq,
      "q_ann_pq_rerank" -> pqRerank,
      "q_ann_ivfpq" -> ivfpq,
      "q_ann_sq8" -> sq8,
      "q_ann_binary" -> bin,
      "q_ann_truncated" -> trunc,
      "q_recon_candidates" -> recon,
      "q_semdedup" -> semdedup,
      "q_proto_prune" -> protoPrune,
      "q_emb_neardup_exact" -> exact,
      "q_emb_neardup_lsh" -> lsh,
      "q_pair_mining" -> pairMining,
      "q_cosine_topk" -> topk,
      "q_mmr" -> mmr
    )
  }
}
