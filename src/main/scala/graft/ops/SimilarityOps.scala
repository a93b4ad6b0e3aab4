package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k per query (exact, the correctness
  * oracle). Scale path: IVF-style partition pruning — assign every vector
  * to its nearest of C centroids at write time, probe only the nProbe
  * closest centroids per query, exact re-rank inside the probed cells.
  * Both are pure DataFrame dataflow; the centroid assignment is a
  * broadcast join (centroid table is tiny by construction).
  */
object SimilarityOps {

  /** Exact brute-force top-k per query: cross join queries × corpus with
    * the corpus broadcast-OR-shuffled by Catalyst/AQE, cosine scored,
    * window top-k per query. Queries table must be small relative to the
    * corpus (the common shape); the corpus is never collected.
    */
  def bruteForceTopK(
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      k: Int,
      excludeSelf: Boolean = true // false when query ids are a separate id space
  ): DataFrame = {
    // corpus-side parallelism drives the scoring loop: a small-file scan
    // arrives as one partition, which would serialize every cosine —
    // spread it across the session's shuffle width first
    val p = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val paired = queries
      .select(col(queryId).as("query_id"), col(queryEmb).as("q_emb"))
      .crossJoin(corpus.select(col(corpusId).as("neighbor_id"), col(corpusEmb).as("c_emb"))
        .repartition(p))
    val scored = (if (excludeSelf) paired.filter(col("query_id") =!= col("neighbor_id"))
                  else paired)
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("q_emb"), col("c_emb")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF index: pick C deterministic centroids STRIDED across the id
    * range (ids ≡ 0 mod n/C, first C by id) so the cells cover the
    * corpus instead of its first block — better recall than round 1's
    * "first C by id" while staying exactly oracle-replayable; k-means
    * refinement remains an optional offline step. Scale shape: a filter
    * + TakeOrderedAndProject (C small), never a global window over the
    * corpus. Assign each corpus vector to its nearest centroid.
    * Returns (corpus with `cell` column, centroids DF).
    */
  def ivfIndex(
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      numCells: Int
  ): (DataFrame, DataFrame) = {
    val n = corpus.count()
    val stride = math.max(1L, n / numCells)
    val centroids = corpus
      .filter(pmod(col(corpusId), lit(stride)) === 0)
      .orderBy(col(corpusId).asc)
      .limit(numCells)
      .select(
        row_number().over(Window.orderBy(col(corpusId).asc)).as("cell"),
        col(corpusEmb).as("cent_emb")
      )
    (assignToCells(corpus, corpusId, corpusEmb, centroids), centroids)
  }

  /** Nearest-centroid assignment: broadcast join + per-vector argmax.
    * `keepSim` retains the winning cosine as `sim` (the
    * prototypicality score [[prototypePrune]] ranks on).
    */
  private def assignToCells(
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      centroids: DataFrame,
      keepSim: Boolean = false
  ): DataFrame = {
    val assigned = corpus
      .crossJoin(broadcast(centroids))
      .withColumn("sim", VectorFunctions.cosineSimilarity(col(corpusEmb), col("cent_emb")))
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col(corpusId)).orderBy(col("sim").desc, col("cell").asc)
        )
      )
      .filter(col("rn") === 1)
    if (keepSim) assigned.drop("rn", "cent_emb")
    else assigned.drop("rn", "sim", "cent_emb")
  }

  /** SSL-prototype pruning — the density-pruning stage of the D4
    * curation recipe (SemDeDup to kill near-dups, THEN drop the most
    * prototypical fraction of every cluster; Sorscher et al. 2022,
    * Tirumala et al. 2023 — public literature): cluster the embedding
    * space, score each point by cosine to its assigned centroid
    * (prototypicality), and DROP the top `dropFraction` most
    * prototypical points per cell — redundant mass near cluster modes
    * contributes least to training, while the retained lower-density
    * points carry the information.
    *
    * Dataflow: one broadcast centroid join + per-vector argmax (the IVF
    * assignment), one tiny per-cell count agg joined back broadcast,
    * and ONE cell-partitioned rank window. Scale contract: the window
    * sorts within cells only; cell size is corpus/numCells by k-means
    * balance, so `numCells` is the knob that bounds per-reducer work
    * (scale it with the corpus exactly as the IVF index does; a
    * degenerate mega-cell falls to AQE skew handling like every keyed
    * window here).
    *
    * Output: the RETAINED rows — (idCol, cell, proto_sim), where
    * proto_sim is the cosine to the assigned centroid.
    */
  def prototypePrune(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numCells: Int,
      dropFraction: Double): DataFrame = {
    require(dropFraction >= 0.0 && dropFraction < 1.0,
      "dropFraction must be in [0, 1)")
    val (_, centroids) = ivfIndex(corpus, idCol, embCol, numCells)
    val assigned = assignToCells(corpus, idCol, embCol, centroids,
      keepSim = true)
      .select(col(idCol), col("cell"), col("sim").as("proto_sim"))
    // rank and cell-count ride the SAME cell partitioning (one
    // exchange, one sort) — a separate count agg would re-derive the
    // whole assignment subtree (cross-join + argmax shuffle) a second
    // time, doubling the dominant cost
    val byCell = Window.partitionBy(col("cell"))
    assigned
      .withColumn("rn", row_number().over(
        byCell.orderBy(col("proto_sim").desc, col(idCol).asc)))
      .withColumn("n", count(lit(1)).over(byCell))
      .filter(col("rn") > ceil(lit(dropFraction) * col("n")))
      .drop("rn", "n")
  }

  /** IVF index with Lloyd refinement: seed with the strided centroids,
    * then `lloydIters` rounds of (assign → elementwise-mean recenter).
    * Fixed iteration count keeps it reproducible up to float-sum order;
    * cells that lose every member drop out (classic k-means shrinkage).
    * Better recall than raw strided seeding on clustered corpora; the
    * oracle-checked q_ann_ivf stays on the strided index, whose exact
    * bucketing DuckDB can replay — recall of this variant is asserted
    * against brute force in IvfSpec instead.
    *
    * Scale shape per round: one broadcast assign + one
    * (cell,pos)-keyed mean — both map-side combinable; the centroid
    * table never leaves broadcast size.
    */
  def ivfIndexKMeans(
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      numCells: Int,
      lloydIters: Int = 5
  ): (DataFrame, DataFrame) = {
    var (assigned, centroids) = ivfIndex(corpus, corpusId, corpusEmb, numCells)
    for (_ <- 1 to lloydIters) {
      centroids = assigned
        .select(col("cell"), posexplode(col(corpusEmb)).as(Seq("pos", "v")))
        .groupBy(col("cell"), col("pos"))
        .agg(avg(col("v")).as("m"))
        .groupBy(col("cell"))
        .agg(
          transform(
            array_sort(collect_list(struct(col("pos"), col("m")))),
            // 6-dp quantization makes the recentered value independent of
            // float-sum partition order (~1e-13 noise vs a 5e-7 rounding
            // step), so the index is reproducible run-to-run and, in
            // principle, replayable by an external oracle
            s => round(s.getField("m"), 6)
          ).as("cent_emb"))
        .localCheckpoint()
      assigned = assignToCells(corpus, corpusId, corpusEmb, centroids)
    }
    (assigned, centroids)
  }

  /** The 100 TB layout: persist the assigned corpus PARTITIONED BY cell
    * so a probe becomes a partition-pruned scan — Spark reads only the
    * nProbe cell directories (PlanSpec asserts PartitionFilters appear).
    */
  def writeIvfPartitioned(assigned: DataFrame, path: String): Unit =
    assigned.write.partitionBy("cell").mode("overwrite").parquet(path)

  /** Post-append index health from [[appendIvfPartitioned]]: per-cell
    * size extremes and the max/median skew watermark that drives the
    * re-cluster recommendation.
    */
  final case class IvfAppendStats(
      appended: Long,
      cells: Int,
      maxCell: Long,
      medianCell: Long,
      skew: Double,
      recommendRecluster: Boolean)

  /** Default max/median cell-size watermark for [[appendIvfPartitioned]]. */
  val DefaultIvfSkewWatermark = 4.0

  /** Incremental maintenance for the partitioned layout: assign NEW
    * vectors to the EXISTING centroids and append them into the
    * cell-partitioned directory — no rebuild, no rewrite of existing
    * files (append drops new parquet files into the touched cell=…
    * directories only). Routing is the same broadcast assign the
    * initial build uses, so probing the grown index is identical to
    * probing a fresh build of the full corpus against the same
    * centroids (IvfSpec asserts this).
    *
    * RE-CLUSTER POLICY (the knob, now quantified): the returned
    * [[IvfAppendStats]] carries a cell-skew watermark —
    * skew = max-cell / median-cell over the post-append index;
    * `recommendRecluster` fires when it exceeds `skewWatermark`
    * (default [[DefaultIvfSkewWatermark]] = 4.0: probes routed to the
    * max cell then scan ≥4× the median cell's rows, the point where
    * per-probe cost dispersion starts to dominate the re-cluster
    * spend). Skew — not volume — is the right trigger: the recall
    * telemetry (Bench `q_ann_ivf_append_stale/fresh`, IvfSpec staleness
    * bound) shows a distribution-PRESERVING append costs ≈0.00
    * recall@10 against stale centroids (1.000 vs 1.000 at sf0.01; 0.90
    * vs 0.94 at sf0.001), while distribution SHIFT concentrates
    * arrivals in few cells — exactly what the watermark measures. The
    * per-cell counts group on the `cell` PARTITION column only, so the
    * check never reads vector data. On recommendation, re-run
    * [[ivfIndexKMeans]] + [[writeIvfPartitioned]].
    */
  def appendIvfPartitioned(
      newVectors: DataFrame,
      corpusId: String,
      corpusEmb: String,
      centroids: DataFrame,
      path: String,
      skewWatermark: Double = DefaultIvfSkewWatermark
  ): IvfAppendStats = {
    require(skewWatermark >= 1.0, "skewWatermark must be >= 1.0")
    val assigned = assignToCells(newVectors, corpusId, corpusEmb, centroids)
    assigned.write.partitionBy("cell").mode("append").parquet(path)
    val spark = newVectors.sparkSession
    val counts = spark.read.parquet(path)
      .groupBy(col("cell")).agg(count(lit(1)).as("n"))
      .collect().map(_.getLong(1)).sorted
    val appended = newVectors.count()
    if (counts.isEmpty)
      IvfAppendStats(appended, 0, 0L, 0L, 1.0, recommendRecluster = false)
    else {
      val median = counts(counts.length / 2)
      val mx = counts.last
      val skew = mx.toDouble / math.max(1L, median)
      IvfAppendStats(appended, counts.length, mx, median, skew,
        recommendRecluster = skew > skewWatermark)
    }
  }

  /** Read back only the probed cells; the cell predicate is a partition
    * filter, never a row filter.
    */
  def readIvfCells(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      cells: Seq[Int]
  ): DataFrame =
    spark.read.parquet(path).filter(col("cell").isin(cells: _*))

  /** IVF probe: route each query to its nProbe nearest cells, exact
    * cosine re-rank within the probed cells only. At scale the corpus is
    * written partitioned by `cell`, so the probe prunes partitions at
    * the parquet scan.
    */
  def ivfTopK(
      assignedCorpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      centroids: DataFrame,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      k: Int,
      nProbe: Int
  ): DataFrame = {
    val routed = queries
      .select(col(queryId).as("query_id"), col(queryEmb).as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", VectorFunctions.cosineSimilarity(col("q_emb"), col("cent_emb")))
      .withColumn(
        "rn",
        row_number().over(
          Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cell").asc)
        )
      )
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("q_emb"), col("cell"))

    val scored = routed
      .join(
        assignedCorpus.select(
          col(corpusId).as("neighbor_id"),
          col(corpusEmb).as("c_emb"),
          col("cell")
        ),
        Seq("cell")
      )
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("q_emb"), col("c_emb")))
    val w = Window
      .partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** SemDeDup-style semantic deduplication: cluster the corpus into IVF
    * cells (the strided, oracle-replayable index), then within each
    * cell drop every document that has a SMALLER-id near-duplicate at
    * `threshold` cosine or above. The kept set is exactly the documents
    * with no smaller near-dup neighbor in their cell — a deterministic
    * one-pass greedy exemplar choice (the drop decision reads only the
    * pair list, never whether the neighbor itself survived, so chains
    * a~b~c with cos(a,c) < θ keep only a; that over-drop is the
    * standard SemDeDup trade and is documented rather than repaired —
    * transitive grouping is DedupOps.duplicateClusters' job).
    *
    * Scale shape: one broadcast centroid assign, then a cell-keyed
    * self-join — all-pairs only WITHIN a cell, so numCells is the
    * contract bound (cell size ≈ corpus/C; raise C with corpus size,
    * same framing as the bounded-group n-gram Jaccard). Cross-cell
    * near-dups are deliberately out of scope: that recall/cost knob is
    * what the banded sign-LSH path (embeddingNearDupPairs) covers.
    *
    * Output: one row per input doc — (id, cell, dup_of: smallest
    * same-cell near-dup id below it or null, kept).
    */
  def semanticDedup(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numCells: Int,
      threshold: Double
  ): DataFrame = {
    val (assigned, _) = ivfIndex(corpus, idCol, embCol, numCells)
    val a = assigned.select(col("cell"), col(idCol).as("doc_a"),
      col(embCol).as("emb_a"))
    val b = assigned.select(col("cell"), col(idCol).as("doc_b"),
      col(embCol).as("emb_b"))
    val dupOf = a.join(b, Seq("cell"))
      .filter(col("doc_a") < col("doc_b"))
      .filter(VectorFunctions.cosineSimilarity(col("emb_a"), col("emb_b"))
        >= threshold)
      .groupBy(col("doc_b").as(idCol))
      .agg(min(col("doc_a")).as("dup_of"))
    assigned.select(col(idCol), col("cell"))
      .join(dupOf, Seq(idCol), "left")
      .withColumn("kept", col("dup_of").isNull)
  }

  // ------------------------------------------------------------------
  // Product quantization (PQ) — the memory-compression scale path
  // ------------------------------------------------------------------

  /** PQ codebooks, strided-deterministic: split the `dims`-dim space
    * into `numSub` subspaces; subspace m's `numCodes` code vectors are
    * the m-th subvectors of the same numCodes STRIDED corpus rows (the
    * [[ivfIndex]] centroid trick, so the oracle replays the codebook
    * exactly; per-subspace Lloyd refinement is the offline upgrade,
    * exactly as [[ivfIndexKMeans]] is to [[ivfIndex]]).
    *
    * Returned driver-side — numSub × numCodes × (dims/numSub) doubles,
    * kilobytes at any realistic setting — so encoding and search embed
    * the codebooks as literal expressions: zero joins, zero shuffles.
    */
  def pqCodebooks(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numSub: Int,
      numCodes: Int): Array[Array[Array[Double]]] = {
    val n = corpus.count()
    val stride = math.max(1L, n / numCodes)
    val rows = corpus
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol).asc)
      .limit(numCodes)
      .select(col(embCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    require(rows.length == numCodes, s"corpus too small for $numCodes codes")
    val dims = rows.head.length
    require(dims % numSub == 0, "numSub must divide dims")
    val subDim = dims / numSub
    Array.tabulate(numSub, numCodes)((m, k) =>
      rows(k).slice(m * subDim, (m + 1) * subDim))
  }

  /** Lloyd-refined PQ codebooks — the offline upgrade to
    * [[pqCodebooks]], exactly as [[ivfIndexKMeans]] is to [[ivfIndex]]:
    * per subspace, k-means over a bounded deterministic SAMPLE of the
    * corpus (strided ids — codebook training on a sample is the
    * standard practice at scale: quantizer quality saturates long
    * before the sample stops fitting on the driver, so the corpus is
    * never collected). Seeded with the strided codebooks; fixed
    * iteration count and lowest-code tie-breaks keep the result
    * deterministic; codes that lose every member keep their previous
    * center (no collapse).
    */
  def pqCodebooksKMeans(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      numSub: Int,
      numCodes: Int,
      lloydIters: Int = 5,
      sampleSize: Int = 4096): Array[Array[Array[Double]]] = {
    val cb = pqCodebooks(corpus, idCol, embCol, numSub, numCodes)
    val n = corpus.count()
    val stride = math.max(1L, n / sampleSize)
    val sample = corpus
      .filter(pmod(col(idCol), lit(stride)) === 0)
      .orderBy(col(idCol).asc)
      .limit(sampleSize)
      .select(col(embCol))
      .collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val subDim = cb(0)(0).length
    (0 until numSub).foreach { m =>
      val subs = sample.map(_.slice(m * subDim, (m + 1) * subDim))
      (0 until lloydIters).foreach { _ =>
        val sums = Array.fill(numCodes, subDim)(0.0)
        val cnts = Array.fill(numCodes)(0L)
        subs.foreach { v =>
          var bk = 0; var bd = Double.MaxValue
          var k = 0
          while (k < numCodes) {
            var d = 0.0; var j = 0
            while (j < subDim) { val x = v(j) - cb(m)(k)(j); d += x * x; j += 1 }
            if (d < bd) { bd = d; bk = k } // strict <: ties keep lowest k
            k += 1
          }
          cnts(bk) += 1
          var j = 0
          while (j < subDim) { sums(bk)(j) += v(j); j += 1 }
        }
        (0 until numCodes).foreach { k =>
          if (cnts(k) > 0)
            (0 until subDim).foreach(j => cb(m)(k)(j) = sums(k)(j) / cnts(k))
        }
      }
    }
    cb
  }

  /** PQ encoding: each vector becomes `numSub` small codes (argmin-L2
    * sub-centroid per subspace, ties to the lower code). The 100 TB
    * point: a 64-dim float vector (256 B) compresses to numSub codes
    * (8 B at 8×16) — the corpus ANN artifact shrinks ~32×, and a scan
    * that scores candidates reads codes, not vectors. Pure projection
    * over codebook literals: fixed-order double arithmetic, so the
    * oracle replays it bit-for-bit; no join, no shuffle.
    */
  def pqEncode(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      cb: Array[Array[Array[Double]]],
      passthrough: Seq[String] = Nil): DataFrame =
    // one fused native kernel pass (argmin ties to the lower code);
    // the first cut unrolled the codebooks into literal expression
    // trees, which was bit-identical but cost Catalyst ~40 s/query in
    // analysis+codegen at 8 × 64 codes — the codebook now rides the
    // generated code as a single referenced object
    corpus.select(
      (col(idCol) +: passthrough.map(col)) :+
        VectorFunctions.pqCodes(col(embCol), cb).as("codes"): _*)

  /** PQ top-k by asymmetric distance (ADC): per query, the numSub ×
    * numCodes table of exact query-subvector ↔ code distances is one
    * literal-codebook projection; each candidate then scores as
    * numSub table LOOKUPS summed in fixed subspace order — never a
    * dims-wide dot product against the corpus. On unit-norm vectors
    * ADC-L2 ordering is cosine-monotone up to quantization error.
    *
    * Scale shape: the corpus side of the cross join carries only
    * (id, codes); queries (with their small dtab) broadcast. Compose
    * with IVF cells to prune candidates first — PQ compresses what a
    * probe must read, IVF bounds how much is probed.
    *
    * Output: (query_id, neighbor_id, adc [squared L2], rank).
    */
  /** Per-query ADC distance table over `cb`: numSub × numCodes exact
    * query-subvector ↔ code distances, flattened in (m, code) order —
    * same native-kernel mechanics as [[pqEncode]].
    */
  private def dtabCol(queryEmb: String, cb: Array[Array[Array[Double]]]): Column =
    VectorFunctions.pqDtab(col(queryEmb), cb)

  /** ADC score of a `codes` row against the row's `_dtab`: numSub table
    * lookups summed in fixed subspace order.
    */
  private def adcCol(cb: Array[Array[Array[Double]]]): Column =
    cb.indices.map(m =>
      element_at(col("_dtab"), col("codes").getItem(m) + m * cb(0).length + 1))
      .reduce(_ + _)

  def pqTopK(
      codes: DataFrame,
      codesId: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      cb: Array[Array[Array[Double]]],
      k: Int): DataFrame = {
    val p = codes.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.select(col(queryId).as("query_id"), dtabCol(queryEmb, cb).as("_dtab"))
    val scored = q
      .crossJoin(codes.select(col(codesId).as("neighbor_id"), col("codes"))
        .repartition(p))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcCol(cb))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc").asc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("adc"), col("rank"))
  }

  /** PQ search the way it deploys: ADC over codes produces a
    * `shortlist`-sized candidate set per query, which is then re-ranked
    * by EXACT cosine against the real vectors. The code scan does the
    * heavy lifting (reads 4–8 B/vector instead of 256); the exact pass
    * touches only queries × shortlist vectors — at scale, a point
    * lookup into the id-bucketed vector table, here a broadcast of the
    * (bounded) shortlist onto one vector scan. On this deliberately
    * isotropic corpus (PQ's worst case — no cluster structure for the
    * codebooks to exploit) recall@10 tracks the SCANNED FRACTION:
    * 8×64 codebooks read 0.90 at a 20%-of-corpus shortlist and 0.64 at
    * 5% (raw ADC top-10: 0.16–0.3); BASELINE §15 records the sweep.
    * Shortlist is the recall knob — clustered real embeddings tighten
    * the ADC ordering, so the fraction a given recall needs shrinks
    * with realistic data, and the IVF composition bounds it further.
    */
  def pqTopKReranked(
      codes: DataFrame,
      codesId: String,
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      cb: Array[Array[Array[Double]]],
      k: Int,
      shortlist: Int): DataFrame = {
    val short = pqTopK(codes, codesId, queries, queryId, queryEmb, cb, shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(
        short.join(
          queries.select(col(queryId).as("query_id"), col(queryEmb).as("q_emb")),
          Seq("query_id")))
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(corpusEmb).as("c_emb")),
        Seq("neighbor_id"))
      .withColumn("cosine",
        VectorFunctions.cosineSimilarity(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** SQ8 per-dimension bounds — the trained artifact of scalar
    * quantization: (mins, maxs) over the corpus. One dimension-keyed
    * min/max aggregation; the posexplode partial-aggregates to `dims`
    * rows per task before the (dims × tasks)-row shuffle, so the corpus
    * embeddings themselves never move. Output arrays are dims-sized
    * driver constants (the [[pqCodebooks]] contract).
    */
  def sq8Bounds(
      corpus: DataFrame,
      embCol: String): (Array[Double], Array[Double]) = {
    val rows = corpus
      .select(posexplode(col(embCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(min(col("x").cast("double")).as("mn"),
        max(col("x").cast("double")).as("mx"))
      .orderBy(col("d"))
      .collect()
    require(rows.nonEmpty, "empty corpus")
    (rows.map(_.getDouble(1)), rows.map(_.getDouble(2)))
  }

  /** SQ8 encode: one int8-range code per dimension — 4× smaller than
    * float32 with far better fidelity than PQ's 4–8 codes/vector; the
    * standard first compression rung (FAISS SQ8). Zero-shuffle
    * native-kernel projection, same shape as [[pqEncode]].
    */
  def sq8Encode(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      bounds: (Array[Double], Array[Double]),
      passthrough: Seq[String] = Nil): DataFrame =
    corpus.select(
      (col(idCol) +: passthrough.map(col)) :+
        VectorFunctions.sq8Codes(col(embCol), bounds._1, bounds._2)
          .as("codes"): _*)

  /** SQ8 top-k by asymmetric cosine: exact query vs in-kernel
    * reconstructed corpus vectors. Same plan shape as [[pqTopK]]
    * (queries broadcast over the code scan, per-query top-k window);
    * the code table is what a 100-TB serving scan READS — 64 B/vector
    * here vs 256 B raw. Compose with IVF cells to bound what is probed,
    * or re-rank a shortlist exactly as [[pqTopKReranked]] does.
    */
  def sq8TopK(
      codes: DataFrame,
      codesId: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      bounds: (Array[Double], Array[Double]),
      k: Int): DataFrame = {
    val p = codes.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.select(col(queryId).as("query_id"), col(queryEmb).as("_q"))
    val scored = broadcast(q)
      .crossJoin(codes.select(col(codesId).as("neighbor_id"), col("codes"))
        .repartition(p))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("sq8_cosine",
        VectorFunctions.sq8Cosine(col("_q"), col("codes"),
          bounds._1, bounds._2))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("sq8_cosine").desc, col("neighbor_id").asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("sq8_cosine"),
        col("rank"))
  }

  /** Binary-quantization thresholds — per-dimension means over the
    * corpus, quantized to 1e-6 via floor(µ·1e6 + 0.5)/1e6 so the
    * trained artifact is ENGINE-PORTABLE: a last-ulp difference in the
    * mean's summation order (Spark partials vs any other engine) cannot
    * move the quantized threshold, so the sign bits replay exactly.
    * Same one-agg shape as [[sq8Bounds]]; the embeddings never shuffle.
    */
  def binaryThresholds(corpus: DataFrame, embCol: String): Array[Double] =
    corpus
      .select(posexplode(col(embCol)).as(Seq("d", "x")))
      .groupBy(col("d"))
      .agg(avg(col("x").cast("double")).as("mu"))
      .orderBy(col("d"))
      .collect()
      .map(r => math.floor(r.getDouble(1) * 1e6 + 0.5) / 1e6)

  /** Binary encode: 1 bit per dimension (bit = x > threshold), packed
    * into ceil(dims/64) longs — 32× smaller than float32, the extreme
    * end of the compression ladder (float32 → SQ8 4× → PQ ~32–64× →
    * binary 32× at O(1) distance cost). Zero-shuffle kernel projection.
    */
  def binaryEncode(
      corpus: DataFrame,
      idCol: String,
      embCol: String,
      thresholds: Array[Double],
      passthrough: Seq[String] = Nil): DataFrame =
    corpus.select(
      (col(idCol) +: passthrough.map(col)) :+
        VectorFunctions.binCodes(col(embCol), thresholds).as("codes"): _*)

  /** Binary ANN, the deployable shape: Hamming shortlist over the packed
    * codes (a popcount per candidate — the cheapest possible distance),
    * exact cosine re-rank of the shortlist only ([[pqTopKReranked]]
    * pattern). The code scan reads dims/8 bytes per vector; at 100 TB of
    * float32 that is a ~3 TB first pass, and the exact re-rank touches
    * only shortlist × queries raw vectors via a broadcast-keyed join.
    */
  def binaryTopKReranked(
      codes: DataFrame,
      codesId: String,
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      thresholds: Array[Double],
      k: Int,
      shortlist: Int): DataFrame = {
    val p = codes.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.select(col(queryId).as("query_id"),
      VectorFunctions.binCodes(col(queryEmb), thresholds).as("_qc"))
    val scored = broadcast(q)
      .crossJoin(codes.select(col(codesId).as("neighbor_id"), col("codes"))
        .repartition(p))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("hamming", VectorFunctions.binHamming(col("_qc"), col("codes")))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("hamming").asc, col("neighbor_id").asc)
    val short = scored
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(
        short.join(
          queries.select(col(queryId).as("query_id"), col(queryEmb).as("q_emb")),
          Seq("query_id")))
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(corpusEmb).as("c_emb")),
        Seq("neighbor_id"))
      .withColumn("cosine",
        VectorFunctions.cosineSimilarity(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Matryoshka / truncated-dimension ANN, the deployable shape: coarse
    * cosine over only the FIRST `prefixDims` dimensions (MRL-style
    * embeddings front-load information, so a prefix is a trained
    * coarse code — and even for ordinary embeddings it is an unbiased
    * random projection), exact full-dim re-rank of the shortlist only.
    * The third compression axis after precision (SQ8/binary) and
    * subspace (PQ): the coarse scan reads prefixDims/dims of the bytes
    * with NO trained artifact at all — nothing to re-train on append.
    * Composed entirely from builtins (slice) + the cosine kernel; same
    * plan shape as [[pqTopKReranked]].
    */
  def truncatedTopKReranked(
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      prefixDims: Int,
      k: Int,
      shortlist: Int): DataFrame = {
    require(prefixDims >= 1, "prefixDims must be >= 1")
    val p = corpus.sparkSession.sessionState.conf.numShufflePartitions
    val q = queries.select(col(queryId).as("query_id"),
      slice(col(queryEmb), 1, prefixDims).as("_qp"))
    val scored = broadcast(q)
      .crossJoin(corpus
        .select(col(corpusId).as("neighbor_id"),
          slice(col(corpusEmb), 1, prefixDims).as("_cp"))
        .repartition(p))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("coarse",
        VectorFunctions.cosineSimilarity(col("_qp"), col("_cp")))
    val ws = Window.partitionBy(col("query_id"))
      .orderBy(col("coarse").desc, col("neighbor_id").asc)
    val short = scored
      .withColumn("rn", row_number().over(ws))
      .filter(col("rn") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(
        short.join(
          queries.select(col(queryId).as("query_id"), col(queryEmb).as("q_emb")),
          Seq("query_id")))
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(corpusEmb).as("c_emb")),
        Seq("neighbor_id"))
      .withColumn("cosine",
        VectorFunctions.cosineSimilarity(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** IVF × PQ — the full production ANN layout, composed from the two
    * halves: IVF routing bounds WHICH cells a query probes
    * (nProbe/C of the corpus), the probed candidates score by ADC over
    * codes (reading 4–8 B per vector instead of the embedding), and an
    * exact re-rank touches only the shortlist — multiplicative savings:
    * probe fraction × code width. `assignedCodes` is the stored
    * artifact: (id, cell, codes), written partitioned by cell so the
    * probe is a partition-pruned scan of the code table.
    */
  def pqTopKIvf(
      assignedCodes: DataFrame,
      codesId: String,
      corpus: DataFrame,
      corpusId: String,
      corpusEmb: String,
      centroids: DataFrame,
      queries: DataFrame,
      queryId: String,
      queryEmb: String,
      cb: Array[Array[Array[Double]]],
      k: Int,
      nProbe: Int,
      shortlist: Int): DataFrame = {
    val routed = queries
      .select(col(queryId).as("query_id"), col(queryEmb).as("q_emb"))
      .crossJoin(broadcast(centroids))
      .withColumn("sim", VectorFunctions.cosineSimilarity(col("q_emb"), col("cent_emb")))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("sim").desc, col("cell").asc)))
      .filter(col("rn") <= nProbe)
      .select(col("query_id"), col("cell"))
    val q = queries.select(col(queryId).as("query_id"), dtabCol(queryEmb, cb).as("_dtab"))
    val short = broadcast(routed.join(q, Seq("query_id")))
      .join(assignedCodes.select(col(codesId).as("neighbor_id"), col("cell"), col("codes")),
        Seq("cell"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("adc", adcCol(cb))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("query_id")).orderBy(col("adc").asc, col("neighbor_id").asc)))
      .filter(col("rn") <= shortlist)
      .select(col("query_id"), col("neighbor_id"))
    val exact = broadcast(
        short.join(queries.select(col(queryId).as("query_id"), col(queryEmb).as("q_emb")),
          Seq("query_id")))
      .join(corpus.select(col(corpusId).as("neighbor_id"), col(corpusEmb).as("c_emb")),
        Seq("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosineSimilarity(col("q_emb"), col("c_emb")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    exact
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Contrastive pair mining for embedding-model training: turn the
    * corpus's own near-duplicate structure into (anchor, positive,
    * negative) triplets — positives are the strongest LSH-confirmed
    * near-dup partner (the standard "mine positives from duplicates"
    * trick when no labels exist), negatives are deterministic
    * hash-picked corpus vectors rejected against the anchor's ENTIRE
    * near-dup partner set, so a negative is never an unlabeled
    * positive.
    *
    * Positive: for each id appearing in [[DedupOps.embeddingNearDupPairs]]
    * output, the partner with max cosine (tie → smaller id).
    * Negative: candidates j = 0..negCands−1 map to
    * id = md5-bucket(anchor‖"-"‖j) over the dense id space [0, n);
    * the first candidate that is neither the anchor nor ANY near-dup
    * partner survives (anchors with all candidates rejected are
    * dropped — raise negCands). Dense ids are a CONTRACT (ids 0..n−1,
    * the embeddings-table shape); remap upstream if sparse.
    *
    * Scale shape: the banded pair join is the only corpus-keyed
    * exchange (inherited from the LSH op); mining adds one anchor-keyed
    * window over pair rows (|pairs| ≪ corpus), a bounded ×negCands
    * explode, one anti-join against pair rows, and two id-keyed joins
    * to fetch vectors for the cosine columns.
    *
    * Output: (anchor, positive, pos_cos, negative, neg_cos), one row
    * per anchor, ordered by anchor.
    */
  def minePairs(
      df: DataFrame,
      idCol: String,
      embCol: String,
      threshold: Double,
      dims: Int,
      bands: Int = 8,
      rowsPerBand: Int = 4,
      negCands: Int = 8): DataFrame = {
    require(negCands >= 1, "negCands must be >= 1")
    val n = df.count() // dense-id contract: ids are exactly [0, n)
    require(n > 0, "empty input")
    val pairs = DedupOps.embeddingNearDupPairs(df, idCol, embCol,
      threshold, dims, bands, rowsPerBand)
    // materialized once (r14): sym feeds BOTH the positives window and
    // the negatives anti-join — lazy lineage re-ran the whole banded
    // LSH pair generation a second time for the anti-join side.
    // Size bound at scale (VERDICT r14 #7, SURVEY §9): |sym| = 2·|near-
    // dup pairs above threshold|, which the LSH banding keeps ≪ corpus²
    // (pairs only form inside equal (band, signature) buckets, and the
    // threshold filter drops non-dups post-cosine); a corpus where the
    // pair table rivals the corpus breaks the per-anchor window itself,
    // not just this checkpoint — recomputing (a second full banded LSH
    // pass + cosine, the pre-r14 shape) is strictly dearer than holding
    // the pairs once. Blocks back the returned DataFrame and are freed
    // by the ContextCleaner when the consumer drops it (ADVICE r14).
    val sym = pairs
      .select(col("doc_a").as("anchor"), col("doc_b").as("partner"), col("cosine"))
      .unionByName(pairs
        .select(col("doc_b").as("anchor"), col("doc_a").as("partner"), col("cosine")))
      .localCheckpoint()
    val posW = Window.partitionBy(col("anchor"))
      .orderBy(col("cosine").desc, col("partner").asc)
    val pos = sym.withColumn("_rn", row_number().over(posW))
      .filter(col("_rn") === 1)
      .select(col("anchor"), col("partner").as("positive"),
        col("cosine").as("pos_cos"))
    val cand = pos
      .select(col("anchor"), col("positive"), col("pos_cos"),
        explode(sequence(lit(0), lit(negCands - 1))).as("_j"))
      .withColumn("_cand", CorpusOps.hashBucket(
        concat(col("anchor").cast("string"), lit("-"), col("_j").cast("string")),
        n.toInt))
    val negW = Window.partitionBy(col("anchor")).orderBy(col("_j").asc)
    val neg = cand
      .join(sym.select(col("anchor"), col("partner").as("_cand")),
        Seq("anchor", "_cand"), "left_anti")
      .filter(col("_cand") =!= col("anchor"))
      .withColumn("_rn", row_number().over(negW))
      .filter(col("_rn") === 1)
      .select(col("anchor"), col("positive"), col("pos_cos"),
        col("_cand").as("negative"))
    val vecs = df.select(col(idCol).as("_vid"), col(embCol).as("_v"))
    neg
      .join(vecs.withColumnRenamed("_vid", "anchor")
        .withColumnRenamed("_v", "_va"), Seq("anchor"))
      .join(vecs.withColumnRenamed("_vid", "negative")
        .withColumnRenamed("_v", "_vn"), Seq("negative"))
      .select(col("anchor"), col("positive"), col("pos_cos"),
        col("negative"),
        VectorFunctions.cosineSimilarity(col("_va"), col("_vn")).as("neg_cos"))
      .orderBy(col("anchor"))
  }
}
