package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.functions.SketchFunctions
import graft.ops.{ImportanceOps, SketchOps}

/** Misra–Gries sketch guarantees + the two-pass exact heavy hitters,
  * and the DSIR importance-weighting/resampling ops.
  */
class SketchSpec extends SparkSuite {

  import spark.implicits._

  // a skewed corpus: token "t<i>" appears i times, i in 1..40, spread
  // over docs of 5 tokens each → n = 820 tokens, known exact counts
  private def skewedDocs = {
    val tokens = (1 to 40).flatMap(i => Seq.fill(i)(s"t$i"))
    val docs = tokens.grouped(5).zipWithIndex
      .map { case (ts, i) => (i.toLong, ts.mkString(" ")) }.toSeq
    docs.toDF("doc_id", "text")
  }

  test("MisraGries: no false negatives above n/(capacity+1); counts are lower bounds") {
    val n = (1 to 40).sum // 820
    for (capacity <- Seq(8, 16, 64); parts <- Seq(1, 7)) {
      val df = skewedDocs.repartition(parts)
      val got = df
        .select(graft.functions.TextFunctions.tokens(col("text")).as("t"))
        .agg(SketchFunctions.misraGries(col("t"), capacity).as("s"))
        .head().getSeq[Row](0)
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got.size <= capacity)
      val bound = n.toDouble / (capacity + 1)
      for (i <- 1 to 40) {
        val true_ = i.toLong
        if (true_ > bound) {
          // guaranteed present, with a lower-bound count short by <= bound
          assert(got.contains(s"t$i"), s"t$i missing at capacity=$capacity parts=$parts")
          val lb = got(s"t$i")
          assert(lb <= true_ && true_ - lb <= bound.toLong + 1,
            s"t$i lb=$lb true=$true_ bound=$bound")
        }
        got.get(s"t$i").foreach(lb => assert(lb <= true_))
      }
    }
  }

  test("heavyHitters equals the exact groupBy result and is partitioning-invariant") {
    val phi = 0.02 // threshold 16.4 over n=820 → tokens t17..t40
    def run(parts: Int) =
      SketchOps.heavyHitters(skewedDocs.repartition(parts), "text", phi)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val exact = (1 to 40).filter(_ > 820 * phi).map(i => s"t$i" -> i.toLong)
      .sortBy(_._1)
    assert(run(1) == exact)
    assert(run(7) == exact)
    // slack=1 (minimum capacity) must still be exact — the guarantee,
    // not the slack, carries correctness
    val tight = SketchOps.heavyHitters(skewedDocs.repartition(5), "text", phi,
      slack = 1.0).collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(tight == exact)
  }

  test("heavyHitters: empty and null-text inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SketchOps.heavyHitters(empty, "text", 0.1).count() == 0)
    val nulls = Seq((1L, null.asInstanceOf[String]), (2L, "a a a b"))
      .toDF("doc_id", "text")
    val got = SketchOps.heavyHitters(nulls, "text", 0.5)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    assert(got == Seq("a" -> 3L)) // 3/4 > 0.5, b's 1/4 is not
  }

  test("importanceWeights: target-like raw docs outweigh off-target raw docs") {
    // target vocabulary {alpha beta gamma}, off-target {xx yy zz}
    val docs = Seq(
      (1L, "alpha beta gamma alpha beta", "t"),
      (2L, "beta gamma alpha gamma", "t"),
      (3L, "alpha beta gamma", "r"), // raw, target-like
      (4L, "xx yy zz xx yy", "r"), // raw, off-target
      (5L, null.asInstanceOf[String], "r"))
      .toDF("doc_id", "text", "grp")
    val w = ImportanceOps.importanceWeights(docs, "doc_id", "text",
      col("grp") === "t", buckets = 64)
      .collect().map(r => r.getLong(0) -> (r.getBoolean(1), r.getLong(2), r.getDouble(3)))
      .toMap
    assert(w.size == 5)
    assert(w(3L)._3 > w(4L)._3, s"target-like ${w(3L)} !> off-target ${w(4L)}")
    assert(w(5L) == ((false, 0L, 0.0))) // null text → zero tokens, zero weight
    assert(w(1L)._2 == 5L && w(4L)._2 == 5L)
  }

  test("kCenterSelect: greedy farthest-point invariants, partitioning-invariant") {
    // three tight clusters far apart + a straggler: k-center must visit
    // each cluster before densifying any of them
    def v(x: Double, y: Double) = Array(x.toFloat, y.toFloat)
    val pts = Seq(
      (1L, v(0, 0)), (2L, v(0.1, 0)), (3L, v(0, 0.1)),
      (10L, v(100, 0)), (11L, v(100.1, 0)),
      (20L, v(0, 100)), (21L, v(0, 100.1)),
      (30L, v(60, 60)))
    def run(parts: Int) = graft.ops.SampleOps
      .kCenterSelect(pts.toDF("vec_id", "embedding").repartition(parts),
        "vec_id", "embedding", k = 4)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    val a = run(1)
    assert(a == run(5)) // deterministic under partitioning
    assert(a.head == ((1, 1L, 0.0))) // seed = min id
    // one center per far cluster, before any near-duplicate
    val ids = a.map(_._2)
    assert(ids.toSet.intersect(Set(10L, 11L)).size == 1)
    assert(ids.toSet.intersect(Set(20L, 21L)).size == 1)
    assert(ids.contains(30L))
    // selection distances are non-increasing (greedy farthest-point)
    val d = a.drop(1).map(_._3)
    assert(d == d.sorted.reverse, d.toString)

    // the carry-min-dist scale path picks bit-identical centers
    // (least() is exact comparison over the same d² doubles)
    val carry = graft.ops.SampleOps
      .kCenterSelect(pts.toDF("vec_id", "embedding").repartition(3),
        "vec_id", "embedding", k = 4, carryMinDist = true, checkpointEvery = 2)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(carry == a, s"carry=$carry recompute=$a")

    // batched carry selection (r15): every batch size must reproduce
    // the sequential selection exactly — the certificate only accepts
    // in-batch picks that strictly beat every uncollected point, and
    // the driver d² replica is bit-identical to the column kernel.
    // Checked on a larger pseudo-random cloud where batches genuinely
    // truncate (ties, collapsing frontiers) plus the cluster fixture.
    val cloud = (0L until 60L).map { i =>
      def h(s: Long) = {
        var x = i * 2654435761L + s * 40503L
        x ^= x >>> 33; x *= 0xff51afd7ed558ccdL; x ^= x >>> 33
        (math.abs(x % 1000L)).toDouble / 10.0
      }
      (i, Array(h(1).toFloat, h(2).toFloat, h(3).toFloat))
    }
    val cloudDf = cloud.toDF("vec_id", "embedding")
    val cloudSeq = graft.ops.SampleOps
      .kCenterSelect(cloudDf, "vec_id", "embedding", k = 20,
        carryMinDist = true, selectBatch = 1)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    for (bs <- Seq(2, 5, 16, 64)) {
      val got = graft.ops.SampleOps
        .kCenterSelect(cloudDf, "vec_id", "embedding", k = 20,
          carryMinDist = true, selectBatch = bs)
        .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
      assert(got == cloudSeq, s"selectBatch=$bs diverged")
    }
    val carryB = graft.ops.SampleOps
      .kCenterSelect(pts.toDF("vec_id", "embedding").repartition(3),
        "vec_id", "embedding", k = 4, carryMinDist = true,
        checkpointEvery = 2, selectBatch = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(carryB == a, s"carryB=$carryB recompute=$a")
    // exhausted geometry through the batched carry path: duplicates
    // must stop the selection, not emit duplicate centers
    val dupC = Seq((1L, v(0, 0)), (2L, v(0, 0)), (3L, v(5, 5)))
      .toDF("vec_id", "embedding")
    val gotC = graft.ops.SampleOps
      .kCenterSelect(dupC, "vec_id", "embedding", k = 3,
        carryMinDist = true, selectBatch = 4)
      .collect().map(_.getLong(1)).toSeq
    assert(gotC == Seq(1L, 3L), gotC.toString)

    // exhausted geometry: k larger than the distinct point set stops
    // early instead of emitting duplicate centers; empty input → empty
    val dup = Seq((1L, v(0, 0)), (2L, v(0, 0)), (3L, v(5, 5)))
      .toDF("vec_id", "embedding")
    val got = graft.ops.SampleOps
      .kCenterSelect(dup, "vec_id", "embedding", k = 3)
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(1L, 3L), got.toString)
    val empty = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(graft.ops.SampleOps
      .kCenterSelect(empty, "vec_id", "embedding", k = 2).count() == 0)
  }

  test("asofJoin tolerance: stale matches null out, in-window and boundary match") {
    val left = Seq((1L, 100L, "a"), (1L, 250L, "b"), (1L, 1000L, "c"),
      (2L, 500L, "d")).toDF("k", "ts", "tag")
    val right = Seq((1L, 90L, "r90"), (1L, 200L, "r200"))
      .toDF("k", "ts", "p")
    def run(tol: Long) = graft.ops.AsofOps
      .asofJoin(left, right, "k", "ts", Seq("p"), toleranceMs = tol)
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    val got = run(100L)
    assert(got("a") == Some("r90")) // 10 <= 100
    assert(got("b") == Some("r200")) // 50 <= 100, latest prior
    assert(got("c") == None) // latest prior is 800 old — no fallback
    assert(got("d") == None) // key 2 has no right rows at all
    // exact boundary is inclusive; unbounded keeps classic semantics
    assert(run(800L)("c") == Some("r200"))
    assert(run(Long.MaxValue)("c") == Some("r200"))
  }

  test("asofJoin directions: forward takes next-at-or-after, nearest picks the closer side") {
    val left = Seq((1L, 100L, "a"), (1L, 200L, "b"), (1L, 149L, "m"),
      (1L, 151L, "n"), (1L, 400L, "z")).toDF("k", "ts", "tag")
    val right = Seq((1L, 100L, "r100"), (1L, 201L, "r201"))
      .toDF("k", "ts", "p")
    def run(dir: String, tol: Long = Long.MaxValue) = graft.ops.AsofOps
      .asofJoin(left, right, "k", "ts", Seq("p"), toleranceMs = tol,
        direction = dir)
      .collect().map(r => r.getString(2) -> Option(r.getString(3))).toMap
    val fw = run("forward")
    assert(fw("a") == Some("r100")) // exact tie matches at distance 0
    assert(fw("b") == Some("r201")) // next at-or-after
    assert(fw("z") == None) // nothing after
    val nr = run("nearest")
    assert(nr("a") == Some("r100"))
    assert(nr("m") == Some("r100")) // 49 back vs 52 forward
    assert(nr("n") == Some("r201")) // 51 back vs 50 forward
    assert(nr("b") == Some("r201")) // 100 back vs 1 forward
    assert(nr("z") == Some("r201")) // only backward exists
    // equal distances break toward backward
    val tie = graft.ops.AsofOps.asofJoin(
      Seq((1L, 150L, "t")).toDF("k", "ts", "tag"),
      Seq((1L, 100L, "lo"), (1L, 200L, "hi")).toDF("k", "ts", "p"),
      "k", "ts", Seq("p"), direction = "nearest")
      .collect().head.getString(3)
    assert(tie == "lo")
    // tolerance applies to the chosen direction's distance
    assert(run("nearest", tol = 10L)("b") == Some("r201"))
    assert(run("nearest", tol = 10L)("m") == None)
  }

  test("spanCorruption: sentinels reconstruct the doc; deterministic; rate in band") {
    val text = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, text), (2L, "")).toDF("doc_id", "text")
    def run() = graft.ops.CorpusOps
      .spanCorruption(docs, "doc_id", "text", rate = 0.3, seed = "s1")
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val a = run()
    assert(a == run()) // deterministic, no RNG state
    val (input, target, nSpans, nMasked) = a(1L)
    assert(a(2L) == (("", "", 0L, 0L))) // token-less doc
    assert(nMasked > 0 && nSpans > 0 && nSpans <= nMasked)
    // every sentinel appears exactly once in input and once in target,
    // in ascending order
    val sentinels = (0L until nSpans).map(k => s"<extra_id_$k>")
    for (s <- sentinels) {
      assert(input.split(" ").count(_ == s) == 1, s)
      assert(target.split(" ").count(_ == s) == 1, s)
    }
    // splicing each target span back at its sentinel restores the doc
    val spans = {
      val parts = target.split(" ")
      val idx = sentinels.map(s => parts.indexOf(s)) :+ parts.length
      sentinels.indices.map(i => parts.slice(idx(i) + 1, idx(i + 1)).toSeq)
    }
    val restored = input.split(" ").flatMap { t =>
      val i = sentinels.indexOf(t)
      if (i >= 0) spans(i) else Seq(t)
    }.mkString(" ")
    assert(restored == text)
    // masked fraction lands near the rate (i.i.d. hash over 60 tokens)
    assert(nMasked >= 6 && nMasked <= 30, nMasked.toString)
  }

  test("memorizationRisk: planted cross-doc passage raises risk; clean and short docs read 0") {
    val passage = (1 to 8).map(i => s"p$i").mkString(" ")
    val docs = Seq(
      (1L, passage + " unique tail one two three four five six"),
      (2L, passage + " different ending with other words here now"),
      (3L, "entirely fresh text with no repeats at all okay then"),
      (4L, "short doc")) // < 8 tokens → no windows
      .toDF("doc_id", "text")
    val got = graft.ops.DedupOps
      .memorizationRisk(docs, "doc_id", "text", winLen = 8)
      .collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toMap
    // docs 1 and 2 share exactly the one p1..p8 window
    assert(got(1L)._2 == 1L && got(2L)._2 == 1L)
    assert(got(1L)._3 > 0.0 && got(2L)._3 > 0.0)
    assert(got(3L) == ((3L, 0L, 0.0))) // 10 tokens → 3 windows, none dup
    assert(got(4L) == ((0L, 0L, 0.0)))
    // risk is the exact fraction
    assert(got(1L)._3 == BigDecimal(1.0 / got(1L)._1)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("epochMix: whole copies + hash fraction, degenerates to weightedMix, monotone") {
    val docs = (1L to 200L).map(i => (i, s"s${i % 2}")).toDF("doc_id", "src")
    def rates(m: Map[String, Double]) =
      m.toSeq.toDF("src", "rate")
    def emitted(m: Map[String, Double]) = graft.ops.CorpusOps
      .epochMix(docs, "doc_id", "src", rates(m))
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("epoch_copy")))
      .toSet
    // integer rate → exactly rate copies of every doc
    val twoX = emitted(Map("s0" -> 2.0, "s1" -> 2.0))
    assert(twoX.size == 400 && twoX.map(_._2).max == 2L)
    // rate <= 1 selects exactly weightedMix's docs, one copy each
    val half = emitted(Map("s0" -> 0.5, "s1" -> 0.5))
    val wm = graft.ops.CorpusOps
      .weightedMix(docs, "doc_id", "src", rates(Map("s0" -> 0.5, "s1" -> 0.5)))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(half.map(_._1) == wm && half.forall(_._2 == 1L))
    // monotone: raising rates only ADDS (doc, copy) pairs
    val lo = emitted(Map("s0" -> 0.7, "s1" -> 1.2))
    val hi = emitted(Map("s0" -> 1.7, "s1" -> 2.9))
    assert(lo.subsetOf(hi), (lo -- hi).toString)
  }

  test("chunkDocuments: tiling, overlap, no redundant tail, round-trip") {
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")), // n=10
      (2L, "a b c"), // n=3 < chunkSize → one whole chunk
      (3L, ""), // zero tokens → no chunks
      (4L, (1 to 8).map(i => s"x$i").mkString(" "))) // n=8 == chunkSize
      .toDF("doc_id", "text")
    val got = graft.ops.CorpusOps
      .chunkDocuments(docs, "doc_id", "text", chunkSize = 8, stride = 4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4)))
      .sortBy(t => (t._1, t._2))
    // doc 1 (n=10): chunks [0,8), [4,10) — the [8,10) tail is redundant
    // and must NOT appear
    val d1 = got.filter(_._1 == 1L)
    assert(d1.map(t => (t._3, t._4)).toSeq == Seq((0L, 8L), (4L, 10L)))
    assert(d1.head._5 == (1 to 8).map(i => s"w$i").mkString(" "))
    assert(d1.last._5 == (5 to 10).map(i => s"w$i").mkString(" "))
    // short doc: single whole chunk; empty doc: nothing; exact-fit: one
    assert(got.filter(_._1 == 2L).map(t => (t._3, t._4)).toSeq == Seq((0L, 3L)))
    assert(!got.exists(_._1 == 3L))
    assert(got.filter(_._1 == 4L).map(t => (t._3, t._4)).toSeq == Seq((0L, 8L)))
    // coverage: every token index of doc 1 falls in some chunk
    val covered = d1.flatMap(t => t._3 until t._4).toSet
    assert(covered == (0 until 10).map(_.toLong).toSet)
  }

  test("importanceGate matches the batch weights against the exported lambda model") {
    // target docs carry the alpha vocabulary, raw docs mostly don't —
    // so raw docs with target vocab (none here) vs off-vocab separate
    val docs = (1L to 60L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma alpha" else "xx yy zz ww",
        i % 3 == 0)).toDF("doc_id", "text", "is_t")
    val lam = ImportanceOps.lambdaArray(docs, "doc_id", "text", col("is_t"),
      buckets = 128)
    assert(lam.length == 128)
    val batch = ImportanceOps.importanceWeights(docs, "doc_id", "text",
      col("is_t"), buckets = 128)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // the gate is the stream-side twin: per-row HOF sum over the SAME
    // model — equal up to summation-order ulps
    val gated = graft.streaming.StreamingPrep.importanceGate(
      docs, "text", lam, threshold = Double.MinValue)
      .collect().map(r => r.getLong(0) -> r.getAs[Double]("dsir_weight")).toMap
    assert(gated.size == 60)
    for ((id, w) <- batch) assert(math.abs(gated(id) - w) < 1e-9, s"doc $id")
    // threshold actually gates: target-vocab docs (every 3rd) score high
    val kept = graft.streaming.StreamingPrep.importanceGate(
      docs, "text", lam, threshold = 0.0)
      .collect().map(_.getLong(0)).toSet
    assert(kept.nonEmpty && kept.forall(_ % 3 == 0), kept.toString)
  }

  test("budgetSelect keeps whole rows up to the exact budget, drops the straddler") {
    // rows a..e with weights 4,3,2,5,1 in key order → budget 10 keeps
    // a(4),b(7),c(9); d(14) straddles and is dropped, e after it too
    val rows = Seq(("a", 4L), ("b", 3L), ("c", 2L), ("d", 5L), ("e", 1L))
      .toDF("k", "w")
    for (parts <- Seq(1, 4)) {
      val got = graft.ops.ShardOps
        .budgetSelect(rows.repartition(parts), "k", "w", budget = 10L)
        .collect().map(r => (r.getString(0), r.getLong(2))).sortBy(_._1).toSeq
      assert(got == Seq(("a", 4L), ("b", 7L), ("c", 9L)), s"parts=$parts $got")
    }
    // budget 0 keeps nothing; exact-fit boundary keeps the fitting row
    assert(graft.ops.ShardOps.budgetSelect(rows, "k", "w", 0L).count() == 0)
    val exact = graft.ops.ShardOps.budgetSelect(rows, "k", "w", 7L)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(exact == Seq("a", "b"))
  }

  test("importanceResample: deterministic seeded Gumbel top-k, k honored") {
    val docs = (1L to 100L).map(i =>
      (i, if (i % 3 == 0) "alpha beta gamma" else "xx yy zz", i % 2 == 0))
      .toDF("doc_id", "text", "is_t")
    val w = ImportanceOps.importanceWeights(docs, "doc_id", "text", col("is_t"))
    def sample(seed: String) =
      ImportanceOps.importanceResample(w.filter(!col("is_target")), k = 10,
        temperature = 0.5, seed = seed)
        .collect().map(_.getLong(0)).toSeq
    val a = sample("s1")
    assert(a == sample("s1")) // reproducible
    assert(a.size == 10 && a.distinct.size == 10)
    assert(a != sample("s2")) // seed actually feeds the noise
    // keys are emitted descending
    val keys = ImportanceOps.importanceResample(w, k = 20, seed = "s3")
      .collect().map(_.getDouble(2)).toSeq
    assert(keys == keys.sortBy(-_))
  }

  test("BloomBuild: no false negatives, partitioning-invariant bits, plausible fpp") {
    import graft.functions.{BloomFunctions, GraftHash}
    val grams = (1 to 500).map(i => s"gram number $i")
    val docs = grams.grouped(10).zipWithIndex
      .map { case (g, i) => (i.toLong, g) }.toSeq.toDF("doc_id", "grams")
    def build(parts: Int, numBits: Int, k: Int): Array[Long] =
      BloomFunctions.fromBytes(docs.repartition(parts)
        .agg(BloomFunctions.bloomBuild(col("grams"), numBits, k).as("bf"))
        .head().getAs[Array[Byte]](0))
    // merge (bitwise OR) is order/partitioning-independent: identical bits
    val one = build(1, 1 << 13, 5)
    assert(build(7, 1 << 13, 5).toSeq == one.toSeq)
    // every inserted gram probes true (Bloom's no-false-negative side)
    import org.apache.spark.unsafe.types.UTF8String
    grams.foreach { g =>
      assert(GraftHash.bloomMightContain(one, UTF8String.fromString(g), 5))
    }
    // 8192 bits / 500 entries ≈ 16 bits/entry, k=5 → fpp well under 5%
    val misses = (1 to 2000).count { i =>
      GraftHash.bloomMightContain(one, UTF8String.fromString(s"absent $i"), 5)
    }
    assert(misses < 100, s"false-positive rate too high: $misses/2000")
    // null arrays and null elements are skipped, not inserted
    val withNulls = Seq((0L, Seq("a", null, "b")), (1L, null))
      .toDF("doc_id", "grams")
    val nb = BloomFunctions.fromBytes(withNulls
      .agg(BloomFunctions.bloomBuild(col("grams"), 1 << 10, 3).as("bf"))
      .head().getAs[Array[Byte]](0))
    assert(GraftHash.bloomMightContain(nb, UTF8String.fromString("a"), 3))
    assert(GraftHash.bloomMightContain(nb, UTF8String.fromString("b"), 3))
  }

  test("approxDistinctChecked: exact side exact, bound holds across layouts and cardinalities") {
    import graft.ops.SketchOps
    val data = (0 until 20000).map { i =>
      if (i % 2 == 0) ("a", s"v${i % 4999}") else ("b", s"w${i % 37}")
    }
    val expectA = data.filter(_._1 == "a").map(_._2).distinct.size.toLong
    val expectB = data.filter(_._1 == "b").map(_._2).distinct.size.toLong
    for (parts <- Seq(1, 7)) {
      val got = SketchOps.approxDistinctChecked(
          data.toDF("g", "v").repartition(parts), "v", "g", rsd = 0.05)
        .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(got("a")._1 == expectA && got("b")._1 == expectB)
      assert(got.values.forall(_._2), got.toString)
    }
    // nulls excluded, tolerance floor of 1 keeps tiny groups honest
    val tiny = Seq(("g", "x"), ("g", null), ("g", "y")).toDF("g", "v")
    val t = SketchOps.approxDistinctChecked(tiny, "v", "g").collect()
    assert(t.head.getLong(1) == 2L && t.head.getBoolean(2))
  }

  test("approxPercentilesChecked: bound holds on skewed data across layouts, estimates near exact") {
    import graft.ops.QuantileOps
    // zipf-ish skew: value v appears ~1000/v times, two groups
    val rows = (1 to 200).flatMap { v =>
      Seq.fill(1000 / v)((if (v % 2 == 0) "a" else "b", v.toLong))
    }.toDF("g", "v")
    val pcts = Map("p50" -> 50, "p90" -> 90, "p99" -> 99)
    for (parts <- Seq(1, 3, 11)) {
      val got = QuantileOps.approxPercentilesChecked(
        rows.repartition(parts), "v", "g", pcts, accuracy = 100)
      assert(got.count() == 6)
      assert(got.filter(!col("within_bound")).count() == 0,
        s"bound violated at $parts partitions")
    }
    // cross-check against the exact op: the true quantiles exist and
    // the tolerance at accuracy=100 is tight (ceil(n/100) ranks), so
    // the all-true result above is a REAL constraint, not a tautology
    val exact = QuantileOps.exactPercentiles(rows, "v", "g", pcts)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(exact.size == 6 && exact(("a", "p50")) >= 2)
    val nA = rows.filter(col("g") === "a").count()
    assert(nA / 100 + 1 < nA / 10, "tolerance must be far below rank spread")
  }
}
