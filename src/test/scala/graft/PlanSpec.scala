package graft

import org.apache.spark.sql.functions._

import graft.ops.{SearchOps, SimilarityOps}

/** Physical-plan assertions — the "is this the plan you'd want at 100×"
  * claims, pinned as tests: predicate pushdown reaches the parquet scan,
  * column pruning shrinks ReadSchema, small dimension joins broadcast,
  * top-k plans as TakeOrderedAndProject (no global sort), and the native
  * vector kernel actually appears in the codegen'd plan instead of a
  * CodegenFallback HOF.
  */
class PlanSpec extends SparkSuite {

  private val SfDir = "/root/testdata/sf0.001"
  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter pushdown + column pruning reach the parquet scan") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = docs.filter(col("doc_id") < 100).select(col("doc_id"), col("lang"))
    val p = plan(q)
    assert(p.contains("PushedFilters:") && p.contains("LessThan(doc_id,100)"), p.take(800))
    assert(p.contains("ReadSchema: struct<doc_id:bigint,lang:string>"), p.take(800))
  }

  test("cosine top-k plans as TakeOrderedAndProject with the native kernel") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val q = SearchOps.cosineTopK(emb, "embedding", "vec_id",
      Array.fill(64)(0.1f), k = 10)
    val p = plan(q)
    assert(p.contains("TakeOrderedAndProject"), p.take(500))
    assert(p.contains("graft_cosine"), p.take(500)) // native expr, not zip_with
    assert(!p.contains("zip_with"), p.take(500))
  }

  test("minhash plan evaluates the shingle kernel exactly once (no inferred-filter re-eval)") {
    // regression guard for the InferFiltersFromGenerate trap: a plain
    // explode of the shingle expression synthesized size(expr)>0 AND
    // isnotnull(expr) and pushed BOTH below the repartition to the scan,
    // re-evaluating the kernel twice single-threaded (9× on this query
    // at sf0.1). The kernel must appear exactly once in the optimized
    // plan — in the projection feeding the generate, never in a Filter.
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = graft.ops.DedupOps.minhashSignatures(docs, "doc_id", "text", 4, 3)
    val opt = q.queryExecution.optimizedPlan.toString
    val hits = "graft_word_shingles31".r.findAllIn(opt).length
    assert(hits == 1, s"shingle kernel appears $hits times in:\n${opt.take(1500)}")
    // the per-row signature kernel must also stay single-evaluation: the
    // mh_i extraction references it n times, and CollapseProject must
    // keep the multi-referenced non-cheap alias in its own projection
    val sigHits = "graft_minhash_sig".r.findAllIn(opt).length
    assert(sigHits == 1, s"sig kernel appears $sigHits times in:\n${opt.take(1500)}")
    // and signature building must not shuffle — no aggregation exchange
    val p = plan(q)
    assert(!p.contains("hashpartitioning(doc_id"), p.take(1500))
  }

  test("IVF probe joins centroids via broadcast, not shuffle") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val (assigned, centroids) = SimilarityOps.ivfIndex(emb, "vec_id", "embedding", 4)
    val q = SimilarityOps.ivfTopK(assigned, "vec_id", "embedding", centroids,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 5, nProbe = 2)
    assert(plan(q).contains("BroadcastHashJoin") ||
      plan(q).contains("BroadcastNestedLoopJoin"), plan(q).take(800))
  }

  test("cell-partitioned IVF layout prunes partitions at the scan") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val (assigned, _) = SimilarityOps.ivfIndex(emb, "vec_id", "embedding", 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    SimilarityOps.writeIvfPartitioned(assigned, dir)
    val probed = SimilarityOps.readIvfCells(spark, dir, Seq(1, 2))
    val p = plan(probed)
    assert(p.contains("PartitionFilters:") && p.contains("cell"), p.take(800))
    // the cell predicate must NOT appear as a pushed ROW filter
    assert(!p.replaceAll("(?s)PartitionFilters.*?]", "").contains("In(cell"),
      p.take(800))
    assert(probed.select(col("cell")).distinct().collect()
      .map(_.getInt(0)).toSet == Set(1, 2))
  }

  test("entropy pair is one kernel eval, zero shuffle beyond the spread repartition") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = docs.select(col("doc_id"),
      round(TextFunctions.charEntropy(col("text")), 6).as("ce"),
      round(TextFunctions.tokenEntropy(col("text")), 6).as("te"))
    val p = plan(q)
    // both fields extract from ONE graft_entropy_stats run per row
    // (physical-plan subexpression elimination names it subExpr; the
    // projection must not carry two kernel calls)
    assert("graft_entropy_stats".r.findAllIn(
      q.queryExecution.optimizedPlan.toString).size == 2) // logical: one per field
    assert(!p.contains("Exchange"), p.take(1500)) // row-local, no shuffle
    assert(p.contains("*(1) Project"), p.take(1500)) // whole-stage codegen'd
  }

  test("prep pipeline stages: langid kernel evaluated once, dedup window on content hash") {
    // the filter→dedup portion of q_prep_pipeline (the final pack
    // checkpoints, so its plan starts at a LogicalRDD): the language +
    // quality gates must evaluate their text kernels ONCE in a single
    // filter pass, and the dedup window partitions by the content hash
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val t = col("text")
    val kept = docs
      .withColumn("lang_pred", TextFunctions.langId(t))
      .filter(col("lang_pred") === lit("en"))
      .filter(TextFunctions.gopherWordCountOk(t, lo = 20) &&
        TextFunctions.gopherMeanLenOk(t) &&
        TextFunctions.gopherSymbolRatio(t) < 0.1 &&
        TextFunctions.gopherStopHits(t) >= 2)
    val survivors = graft.ops.DedupOps.exactDuplicates(kept, "doc_id", "text")
      .filter(!col("is_duplicate"))
      .select(col("doc_id"), lit("en").as("lang_pred"),
        TextFunctions.tokenCount(t).cast("long").as("n_tokens"))
    val opt = survivors.queryExecution.optimizedPlan.toString
    // single-branch pipeline (exactDuplicates retains input columns, the
    // output lang_pred is the filter constant): the langid kernel must
    // appear exactly once — in the filter pass
    val langidHits = "graft_langid".r.findAllIn(opt).length
    assert(langidHits == 1, s"graft_langid appears $langidHits times:\n${opt.take(2000)}")
    assert(opt.contains("content_hash"), opt.take(2000))
    assert(survivors.count() > 0)
  }

  test("prep pipeline stage 0: domain-stats branch scans a source-only pruned projection") {
    // the RefinedWeb domain gate computes its (blocklist ∪ over-cap)
    // set from a scan that must NOT read text — at 100 TB the prior
    // pass touches only the tiny source/url column, and the bad-domain
    // set broadcasts back onto the single main scan
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    import graft.functions.UrlFunctions
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val domExpr = UrlFunctions.registrableDomain(
      UrlFunctions.urlHost(concat(lit("https://"), col("source"), lit(".com/"))))
    val stats = docs.select(domExpr.as("domain"))
      .groupBy(col("domain")).agg(count(lit(1)).as("n_docs"))
    val statsPlan = stats.queryExecution.executedPlan.toString
    val readSchemas = "ReadSchema: struct<[^>]*>".r.findAllIn(statsPlan).toList
    assert(readSchemas.nonEmpty, statsPlan.take(1500))
    readSchemas.foreach { rs =>
      assert(rs.contains("source") && !rs.contains("text"), rs)
    }
    val gated = docs.withColumn("domain", domExpr)
      .join(broadcast(stats.filter(col("n_docs") > 1000000).select(col("domain"))),
        Seq("domain"), "left_anti")
    val gp = plan(gated)
    assert(gp.contains("BroadcastExchange"), gp.take(2000)) // set broadcasts back
    assert(gated.count() > 0)
  }

  test("classifier inference broadcasts the model, never shuffles tokens to it") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    import spark.implicits._
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val weights = (0L until 64L).map(b => (b, 0.1)).toDF("bucket", "weight")
    val q = graft.ops.CorpusOps
      .linearQualityScore(docs, "doc_id", "text", weights, buckets = 64)
    val p = plan(q)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    // exactly the doc-keyed aggregation shuffles; the token stream joins
    // the model map-side, so no exchange keys on the bucket
    assert(!p.contains("hashpartitioning(bucket"), p.take(2000))
  }

  test("semantic dedup assigns cells via broadcast and self-joins only within a cell") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val q = SimilarityOps.semanticDedup(emb, "vec_id", "embedding",
      numCells = 4, threshold = 0.5)
    val p = plan(q)
    // centroid assignment broadcasts; the pair stage is an equi-join on
    // cell (bounded groups), never a cartesian over the corpus
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      p.take(2000))
    assert(!p.contains("CartesianProduct"), p.take(2000))
  }

  test("sequence packing windows per range bucket, never globally") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    val q = graft.ops.ShardOps.packSequences(docs, "doc_id", "n_tokens", 256L)
    val p = plan(q)
    // the prefix-sum window partitions by the range bucket; an empty
    // partitionBy would render as "Window [...], [doc_id ASC..." with no
    // partition spec and move the corpus to one partition
    assert(p.contains("__bucket"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("stratified sampling: ranking window is boundary-bucket scoped, bounds join back via broadcast") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = graft.ops.SampleOps.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 10L, "de" -> 5L))
    val p = plan(q)
    // the row_number window must partition by (stratum, bucket) — a
    // stratum-only partition spec would sort whole sources on one
    // reducer; windowspecdefinition renders both partition columns
    val rnSpec = p.linesIterator.filter(l =>
      l.contains("row_number()") && l.contains("windowspecdefinition")).mkString
    assert(rnSpec.contains("lang#") && rnSpec.contains("_sb#"), p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("exact percentiles: ranking window is boundary-bucket scoped") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = graft.ops.QuantileOps.exactPercentiles(docs, "n_chars", "source",
      Map("p50" -> 50, "p99" -> 99))
    val p = plan(q)
    val rnSpec = p.linesIterator.filter(l =>
      l.contains("row_number()") && l.contains("windowspecdefinition")).mkString
    assert(rnSpec.contains("source#") && rnSpec.contains("_qb#"), p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
  }

  test("incremental dedup never shuffle-joins: every join is broadcast, corpus side streams") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val corpus = docs.filter(pmod(col("doc_id"), lit(5L)) =!= 0)
    val batch = docs.filter(pmod(col("doc_id"), lit(5L)) === 0)
    val store = graft.ops.DedupOps.exactDuplicates(corpus, "doc_id", "text")
      .filter(!col("is_duplicate")).select(col("content_hash"))
    val pExact = plan(
      graft.ops.DedupOps.incrementalExact(batch, store, "doc_id", "text"))
    assert(pExact.contains("BroadcastHashJoin"), pExact.take(2000))
    assert(!pExact.contains("SortMergeJoin"), pExact.take(2000))
    val pLsh = plan(graft.ops.DedupOps.incrementalLshPairs(
      batch, corpus, "doc_id", "text", numHashes = 32, bands = 4))
    assert(!pLsh.contains("SortMergeJoin"), pLsh.take(2000))
    assert("BroadcastHashJoin".r.findAllIn(pLsh).length >= 3, pLsh.take(2000))
    // the corpus side must never be repartitioned by doc — the batch side
    // is localCheckpoint'd (plans as an RDD scan), so ANY doc-keyed
    // exchange in this plan is a corpus-sized shuffle regression
    assert(!pLsh.contains("hashpartitioning(doc#"), pLsh.take(2500))
  }

  test("PQ: encode is a zero-shuffle native-kernel projection over the scan") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val cb = graft.ops.SimilarityOps.pqCodebooks(emb, "vec_id", "embedding", 8, 16)
    val p = plan(graft.ops.SimilarityOps.pqEncode(emb, "vec_id", "embedding", cb))
    // the 100 TB contract: building the code table is one map-side pass
    assert(!p.contains("Exchange"), p.take(2000))
    assert(p.contains("graft_pq_codes"), p.take(2000))
    // "*(n)" prefixes mark whole-stage-codegen'd operators in this
    // toString form — the kernel projection must carry one
    assert(p.contains("*(1) Project"), p.take(2000))
  }

  test("asof join plans as union+window with NO join; range join is an equi-join, never a nested loop") {
    assume(new java.io.File(s"$SfDir/events.parquet").exists())
    import spark.implicits._
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
      .select(col("user_id"), col("event_id"), col("event_type"),
        (col("event_id") * 1000L).as("ms"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id"), col("ms"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ms"), col("event_id").as("click_id"))
    val pAsof = plan(graft.ops.AsofOps.asofJoin(views, clicks, "user_id", "ms", Seq("click_id")))
    // the whole point: point-in-time lookup WITHOUT any join operator
    assert(!pAsof.contains("Join"), pAsof.take(2500))
    assert(pAsof.contains("Window"), pAsof.take(2500))
    val ivals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ms").as("s0"), (col("ms") + 500L).as("e0"))
    val pRange = plan(graft.ops.AsofOps.rangeJoin(
      views.withColumnRenamed("ms", "pt"), ivals, "user_id", "pt", "s0", "e0", 500L))
    // the inequality predicate must ride an equi-join as a residual
    // filter — BroadcastNestedLoopJoin is the per-key cartesian this
    // operator exists to avoid
    assert(!pRange.contains("BroadcastNestedLoopJoin"), pRange.take(2500))
    assert(!pRange.contains("CartesianProduct"), pRange.take(2500))
    assert(pRange.contains("Join"), pRange.take(2500))
  }

  test("interval-overlap join and link prediction plan as equi-joins, never a nested loop; tfidf's only cross join is the one-row N broadcast") {
    assume(new java.io.File(s"$SfDir/events.parquet").exists())
    val ev = spark.read.parquet(s"$SfDir/events.parquet")
    val l = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("a_id"),
        col("event_id").as("a_s"), (col("event_id") + 10L).as("a_e"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("b_id"),
        col("event_id").as("b_s"), (col("event_id") + 10L).as("b_e"))
    val pIv = plan(graft.ops.AsofOps.intervalJoin(l, r, "user_id",
      "a_s", "a_e", "b_s", "b_e", 16L))
    assert(!pIv.contains("BroadcastNestedLoopJoin"), pIv.take(2500))
    assert(!pIv.contains("CartesianProduct"), pIv.take(2500))
    assert(pIv.contains("Join"), pIv.take(2500))

    val edges = ev.select(col("user_id").as("src"),
      (col("event_id") % 50L).as("dst"))
    val pLp = plan(graft.ops.GraphAlgorithms.linkPrediction(edges, topK = 10))
    assert(!pLp.contains("BroadcastNestedLoopJoin"), pLp.take(2500))
    assert(!pLp.contains("CartesianProduct"), pLp.take(2500))

    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val pTf = plan(graft.ops.CorpusOps.tfidfKeywords(docs, "doc_id", "text", 5))
    // exactly one nested-loop: the single-row corpus-count crossJoin —
    // anything more means a real join degenerated
    assert("BroadcastNestedLoopJoin".r.findAllIn(pTf).size <= 1, pTf.take(2500))
    assert(!pTf.contains("CartesianProduct"), pTf.take(2500))
  }

  test("composed IVF x PQ serving scan: broadcasts, banded equi-joins, no cartesian") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val (assigned, centroids) =
      SimilarityOps.ivfIndex(emb, "vec_id", "embedding", numCells = 8)
    val cb = SimilarityOps.pqCodebooks(emb, "vec_id", "embedding", 8, 64)
    val codes = SimilarityOps.pqEncode(assigned, "vec_id", "embedding", cb,
      passthrough = Seq("cell"))
    val q = SimilarityOps.pqTopKIvf(codes, "vec_id", emb, "vec_id", "embedding",
      centroids, emb.filter(col("vec_id") < 5), "vec_id", "embedding", cb,
      k = 10, nProbe = 6, shortlist = 100)
    val p = plan(q)
    // the 100-TB shape: the corpus-sized tables (codes, exact re-rank)
    // join KEYED (cell / query_id / neighbor_id) with small sides
    // broadcast; the ONLY nested-loop joins are the two deliberate
    // numCells-bounded centroid crosses (corpus x centroids assignment,
    // queries x centroids routing) — a third would mean a code-table or
    // re-rank join degenerated to all-pairs
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size == 2, p.take(2500))
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    // codes and ADC tables come from the native kernels, not HOF trees
    assert(p.contains("graft_pq_codes"), p.take(2500))
    assert(p.contains("graft_pq_dtab"), p.take(2500))
  }

  test("SQ8 / binary quantization scans: one bounded query broadcast, kernel codes, keyed re-rank joins") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 5)

    val bounds = SimilarityOps.sq8Bounds(emb, "embedding")
    val pSq8 = plan(SimilarityOps.sq8TopK(
      SimilarityOps.sq8Encode(emb, "vec_id", "embedding", bounds), "vec_id",
      queries, "vec_id", "embedding", bounds, k = 10))
    // one deliberate nested-loop: the k-bounded query broadcast over the
    // code scan; codes and the asymmetric cosine are native kernels
    assert(!pSq8.contains("CartesianProduct"), pSq8.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(pSq8).size == 1, pSq8.take(2500))
    assert(pSq8.contains("graft_sq8_codes"), pSq8.take(2500))
    assert(pSq8.contains("graft_sq8_cosine"), pSq8.take(2500))

    val th = SimilarityOps.binaryThresholds(emb, "embedding")
    val pBin = plan(SimilarityOps.binaryTopKReranked(
      SimilarityOps.binaryEncode(emb, "vec_id", "embedding", th), "vec_id",
      emb, "vec_id", "embedding", queries, "vec_id", "embedding", th,
      k = 10, shortlist = 100))
    // same single bounded broadcast for the Hamming pass; the exact
    // re-rank joins are KEYED (query_id / neighbor_id) hash joins — a
    // second nested-loop would mean the re-rank degenerated to all-pairs
    assert(!pBin.contains("CartesianProduct"), pBin.take(2500))
    assert("BroadcastNestedLoopJoin".r.findAllIn(pBin).size == 1, pBin.take(2500))
    assert(pBin.contains("BroadcastHashJoin"), pBin.take(2500))
    assert(pBin.contains("graft_bin_codes"), pBin.take(2500))
    assert(pBin.contains("graft_bin_hamming"), pBin.take(2500))
  }

  test("substring dedup: hash-keyed agg combines map-side, no cartesian, no single-partition stage") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = graft.ops.DedupOps.duplicateSpanRemoval(docs, "doc_id", "text", winLen = 8)
    val p = plan(q)
    // every stage is keyed (window hash or doc id) — nothing collapses
    // to one partition and nothing goes all-pairs
    assert(!p.contains("CartesianProduct"), p.take(2500))
    assert(!p.contains("SinglePartition"), p.take(2500))
    // duplicate detection partial-aggregates before the exchange (the
    // skew story for boilerplate windows): a partial_count on the
    // window-hash agg must appear below the final agg
    assert(p.contains("partial_count"), p.take(2500))
  }

  test("bigram LM scoring looks up both model tables via broadcast") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = graft.ops.CorpusOps.bigramLmScore(docs, "doc_id", "text",
      vocabTopK = 64, bigramTopK = 256)
    val p = plan(q)
    // the scoring stream must not shuffle against the model: both
    // pruned tables join as broadcasts
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(2500))
    assert(!p.contains("SortMergeJoin"), p.take(2500))
  }

  test("keep-best retention broadcasts cluster membership; argmax windows on cluster key") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("doc_id"), col("n_chars").cast("long").as("score"))
    val clusters = { import spark.implicits._; Seq((1L, 1L), (2L, 1L)).toDF("doc", "cluster") }
    val q = graft.ops.DedupOps.keepBestPerCluster(docs, clusters, "doc_id",
      Seq(col("score").desc))
    val p = plan(q)
    // membership joins as a broadcast (bounded by the pair graph), and
    // the ranking window partitions by cluster — an empty partitionBy
    // would single-reduce the corpus
    assert(p.contains("BroadcastHashJoin"), p.take(2500))
    val rnSpec = p.linesIterator.filter(l =>
      l.contains("row_number()") && l.contains("windowspecdefinition")).mkString
    assert(rnSpec.contains("cluster#"), p.take(2500))
  }

  test("global-shuffle sharding windows per range bucket, never globally") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("doc_id"),
        md5(concat(lit("shuf42:"), col("doc_id").cast("string"))).as("k"))
      .withColumn("one", lit(1L))
    val q = graft.ops.ShardOps.packShards(docs, "k", "one", targetWeight = 16L)
    val p = plan(q)
    assert(p.contains("__bucket"), p.take(2000))
    assert(p.contains("Window"), p.take(2000))
  }

  test("BPE encode is a zero-shuffle map; training pair-agg combines map-side") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    // encode with a fixed merge table: the whole plan must be scan →
    // project (kernel) — any Exchange means tokenization stopped being
    // the stream-through map a 100 TB pass requires
    val enc = graft.ops.CorpusOps.bpeEncode(docs, "doc_id", "text",
      Seq(("t", "h"), ("th", "e")))
    val pEnc = plan(enc)
    assert(!pEnc.contains("Exchange"), pEnc.take(1500))
    assert(pEnc.contains("graft_bpe_encode"), pEnc.take(1500))
  }

  test("media near-dup: fingerprints are per-row, pair join is banded equi-join, never cartesian") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val media = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("doc_id").as("media_id"),
        unhex(md5(col("text"))).as("data"))
    val fp = graft.sources.Multimodal.withAHash(media, "data", "ahash")
      .select(col("media_id"), col("ahash"))
    // fingerprinting itself must not shuffle
    assert(!plan(fp).contains("Exchange"), plan(fp).take(1500))
    val pairs = graft.ops.DedupOps.fingerprintNearDupPairs(
      fp.localCheckpoint(), "media_id", "ahash", bits = 32, bands = 4,
      maxHamming = 3)
    val p = plan(pairs)
    assert(!p.contains("CartesianProduct"), p.take(1500))
    assert(!p.contains("BroadcastNestedLoopJoin"), p.take(1500))
    // the self-join keys on the banded slices
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"), p.take(1500))
  }

  test("misra-gries sketch aggregates with map-side partials; one sketch row shuffles") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = docs
      .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
      .agg(graft.functions.SketchFunctions.misraGries(col("t"), 64).as("s"))
    val p = plan(q)
    // TypedImperativeAggregate plans as ObjectHashAggregate, and the
    // partial/final split must be present: the map side reduces each
    // partition to ONE serialized sketch before the exchange — the
    // whole point vs a token-keyed groupBy at 100 TB
    assert(p.contains("ObjectHashAggregate"), p.take(1200))
    assert("partial_graft_misra_gries".r.findAllIn(p).nonEmpty, p.take(1200))
    assert(!p.contains("hashpartitioning(t"), p.take(1200)) // no token shuffle
  }

  test("dsir: lambda table broadcasts back; resample plans as TakeOrdered") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val w = graft.ops.ImportanceOps.importanceWeights(docs, "doc_id", "text",
      col("lang") === "en", buckets = 64)
    val pw = plan(w)
    // the per-token side must join the bucket-LM table broadcast —
    // a sort-merge there would shuffle the whole token stream by bucket
    assert(pw.contains("BroadcastHashJoin"), pw.take(2000))
    val s = graft.ops.ImportanceOps.importanceResample(w, k = 10)
    assert(plan(s).contains("TakeOrderedAndProject"), plan(s).take(800))
  }

  test("prototype pruning derives the assignment once (rank + count share the cell exchange)") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val q = SimilarityOps.prototypePrune(emb, "vec_id", "embedding", 4, 0.2)
    val opt = q.queryExecution.optimizedPlan.toString
    // one cosine evaluation site = the centroid cross-join appears once;
    // a second one means the per-cell count re-derived the assignment
    assert("graft_cosine".r.findAllIn(opt).length == 1,
      s"assignment subtree duplicated:\n${opt.take(1500)}")
  }

  test("unigram encode is a zero-shuffle native-kernel projection") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val enc = graft.ops.CorpusOps.unigramEncodeDocs(docs, "doc_id", "text",
      Seq("t", "h", "e", "th", "the"), Seq(-3.0, -3.0, -3.0, -1.0, -0.5))
    val p = plan(enc)
    assert(!p.contains("Exchange"), p.take(1200))
    assert(p.contains("graft_unigram_encode"), p.take(1200))
  }

  test("scoped memory scan keeps whole-stage codegen over the filter chain") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val q = docs.filter(col("lang") === "en" && col("n_chars") > 10)
      .select(col("doc_id"))
    // executedPlan renders a whole-stage-codegen'd operator with the
    // `*(stageId)` prefix; the filter+project must both carry it
    val p = plan(q)
    assert(p.contains("*(1) Project") && p.contains("*(1) Filter"), p.take(500))
  }

  test("bloom decontamination: codegen'd row probe, no cartesian anywhere") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
    val evalSet = docs.filter(pmod(col("doc_id"), lit(19)) === 0)
    val train = docs.filter(pmod(col("doc_id"), lit(19)) =!= 0)
    val p = plan(graft.ops.CorpusOps.ngramContaminationBloom(
      train, evalSet, "doc_id", "text", numBits = 1 << 16))
    // the probe is a scalar codegen expression in a row Filter (explode
    // then filter), NOT an ArrayFilter lambda HOF falling back to
    // interpreted eval per gram
    assert(p.contains("graft_bloom_might_contain"), p.take(2000))
    assert(!p.contains("ArrayFilter"), p.take(2000))
    // the probe sits in a row Filter directly over the gram Generate
    // (AQE's initial-plan print has no codegen markers; the row-Filter
    // + no-ArrayFilter pair is the codegen-safe shape)
    assert("Filter \\(?graft_bloom_might_contain".r.findFirstIn(p).isDefined,
      p.take(2500))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), p.take(2000))
  }

  test("quality buckets: cutoff table broadcasts, no ntile / per-group global sort") {
    assume(new java.io.File(s"$SfDir/documents.parquet").exists())
    val docs = spark.read.parquet(s"$SfDir/documents.parquet")
      .select(col("doc_id").as("id"), col("lang").as("grp"),
        (col("n_chars") * 1.0).as("score"))
    val p = plan(graft.ops.CorpusOps.qualityBuckets(docs, "id", "score", "grp"))
    assert(p.contains("BroadcastHashJoin"), p.take(2000))
    // no per-group ntile/rank sort of the DATA — the only windows come
    // from exactPercentiles (group-keyed counts + the by-design
    // single-partition running sum over its TINY per-(group,bucket)
    // bounds table, which the percentile plan pin already covers)
    assert(!p.contains("ntile("), p.take(2000)) // "quantile" != ntile()
    assert(!"Window \\[row_number".r.findFirstIn(p).exists(_ => true) ||
      p.contains("_qb"), p.take(2500))
  }

  test("z-order stats: pure projection arithmetic, one bucket agg, no join anywhere") {
    assume(new java.io.File(s"$SfDir/lineitem.parquet").exists())
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
    val p = plan(graft.ops.LayoutOps.zorderStats(li, "l_partkey", "l_suppkey", 16))
    assert(!p.contains("Join"), p.take(2000))
    // z-value + bucket are per-row integer arithmetic fused into the
    // scan projection; the only exchanges are the bucket agg + order
    assert(p.contains("HashAggregate"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"), p.take(2000))
  }

  test("salted join: shuffles on (key, salt), no cartesian, heavy set broadcasts") {
    assume(new java.io.File(s"$SfDir/lineitem.parquet").exists())
    val li = spark.read.parquet(s"$SfDir/lineitem.parquet")
    val sup = spark.read.parquet(s"$SfDir/supplier.parquet")
      .withColumnRenamed("s_suppkey", "l_suppkey")
    val j = graft.ops.SkewOps.saltedJoin(li, sup, "l_suppkey",
      saltFactor = 4, phi = 0.005)
    val p = plan(j)
    assert(p.contains("_salt"), p.take(2000))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(2000))
    // heavy-key membership rides a broadcast, not a shuffle
    assert(p.contains("BroadcastHashJoin"), p.take(3000))
  }

  test("pair mining: banded equi-joins and broadcasts only, no cartesian") {
    assume(new java.io.File(s"$SfDir/embeddings.parquet").exists())
    val emb = spark.read.parquet(s"$SfDir/embeddings.parquet")
    val p = plan(graft.ops.SimilarityOps.minePairs(emb, "vec_id", "embedding",
      threshold = 0.3, dims = 64, bands = 8, rowsPerBand = 8))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      p.take(3000))
  }
}
