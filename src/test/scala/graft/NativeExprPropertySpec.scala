package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.functions.{HashFunctions, VectorFunctions}

/** Generated equivalence: the native codegen kernels vs the Spark HOF
  * formulations they replaced, over random vectors (with occasional
  * zeros/nulls/length mismatches) and random sorted long sets. The
  * edge-case table in OpsSpec pins the tricky 3VL rows; this sweeps the
  * bulk numeric space where a codegen bug (wrong accumulator, off-by-one
  * bound) would actually live.
  */
class NativeExprPropertySpec extends SparkSuite {

  import spark.implicits._

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  test("CosineSim/DotProduct == HOF formulation over 300 random vector pairs") {
    val vecGen: Gen[Seq[Float]] = for {
      n <- Gen.frequency(8 -> Gen.const(16), 1 -> Gen.const(15), 1 -> Gen.const(0))
      xs <- Gen.listOfN(n,
        Gen.frequency(9 -> Gen.choose(-5.0f, 5.0f), 1 -> Gen.const(0.0f)))
    } yield xs
    val pairGen = for { a <- vecGen; b <- vecGen } yield (a, b)
    val rows = sample(pairGen, 300, seed = 42L)
    val df = rows.toDF("a", "b")

    def legacyCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
      def dd(c: org.apache.spark.sql.Column) = transform(c, x => x.cast("double"))
      def norm(c: org.apache.spark.sql.Column) =
        sqrt(aggregate(dd(c), lit(0.0), (acc, x) => acc + x * x))
      val dot = aggregate(zip_with(dd(a), dd(b), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x)
      when(norm(a) === 0.0 || norm(b) === 0.0, lit(0.0))
        .otherwise(dot / (norm(a) * norm(b)))
    }
    def legacyDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
      aggregate(zip_with(transform(a, _.cast("double")),
        transform(b, _.cast("double")), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

    val got = df.select(
      VectorFunctions.cosineSimilarity(col("a"), col("b")).as("nc"),
      legacyCosine(col("a"), col("b")).as("hc"),
      VectorFunctions.dotProduct(col("a"), col("b")).as("nd"),
      legacyDot(col("a"), col("b")).as("hd")).collect()
    got.foreach { r =>
      def v(i: Int): Any = if (r.isNullAt(i)) null else r.getDouble(i)
      assert(v(0) == v(1), s"cosine: native=${v(0)} hof=${v(1)}")
      assert(v(2) == v(3), s"dot: native=${v(2)} hof=${v(3)}")
    }
  }

  test("EntropyStats kernel == scala reference over 300 random strings") {
    val textGen: Gen[String] = for {
      n <- Gen.frequency(6 -> Gen.choose(0, 40), 2 -> Gen.const(1),
        1 -> Gen.const(0), 1 -> Gen.choose(100, 200))
      cs <- Gen.listOfN(n, Gen.frequency(
        6 -> Gen.alphaNumChar, 2 -> Gen.const(' '), 1 -> Gen.const('a'),
        1 -> Gen.oneOf('!', '.', ',', '\t', 'é', 'Ж')))
    } yield cs.mkString
    val rows = sample(textGen, 300, seed = 1311L)
    val df = rows.toDF("t")

    // driver-side reference: same tokenizer contract, sorted-count sum
    def ref(text: String): (Double, Double) = {
      val toks = text.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty)
      def h(counts: Seq[Long]): Double = {
        val n = counts.sum
        if (n <= 1L) 0.0
        else {
          val s = counts.sorted.map(c => c.toDouble * math.log(c.toDouble)).sum
          math.log(n.toDouble) - s / n
        }
      }
      val tokCounts = toks.groupBy(identity).map(_._2.length.toLong).toSeq
      val chCounts = toks.mkString("").toSeq.groupBy(identity)
        .map(_._2.length.toLong).toSeq
      (h(chCounts), h(tokCounts))
    }

    val got = df.select(
      col("t"),
      graft.functions.TextFunctions.charEntropy(col("t")).as("ce"),
      graft.functions.TextFunctions.tokenEntropy(col("t")).as("te")).collect()
    got.foreach { r =>
      val (ce, te) = ref(r.getString(0))
      assert(r.getDouble(1) == ce, s"char: '${r.getString(0)}' ${r.getDouble(1)} vs $ce")
      assert(r.getDouble(2) == te, s"token: '${r.getString(0)}' ${r.getDouble(2)} vs $te")
    }
  }

  test("PqCodes/PqDtab kernels == scala reference over 200 random vectors and codebooks") {
    val numSub = 4; val numCodes = 5; val subDim = 3
    val dims = numSub * subDim
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(dims,
      Gen.frequency(9 -> Gen.choose(-5.0f, 5.0f), 1 -> Gen.const(0.0f)))
    val rows = sample(vecGen, 200, seed = 7L)
    val cbFlat = sample(Gen.choose(-5.0, 5.0), numSub * numCodes * subDim, seed = 11L)
    val cb = Array.tabulate(numSub, numCodes)((m, k) =>
      (0 until subDim).map(j => cbFlat((m * numCodes + k) * subDim + j)).toArray)

    def refCodes(v: Seq[Float]): Seq[Int] =
      (0 until numSub).map { m =>
        var bk = 0; var bd = Double.MaxValue
        (0 until numCodes).foreach { k =>
          var d = 0.0
          (0 until subDim).foreach { j =>
            val x = v(m * subDim + j).toDouble - cb(m)(k)(j); d += x * x }
          if (d < bd) { bd = d; bk = k }
        }
        bk
      }
    def refDtab(v: Seq[Float]): Seq[Double] =
      for (m <- 0 until numSub; k <- 0 until numCodes) yield {
        var d = 0.0
        (0 until subDim).foreach { j =>
          val x = v(m * subDim + j).toDouble - cb(m)(k)(j); d += x * x }
        d
      }

    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
    val got = df.select(col("id"),
        VectorFunctions.pqCodes(col("v"), cb).as("codes"),
        VectorFunctions.pqDtab(col("v"), cb).as("dtab"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getSeq[Double](2)))).toMap
    rows.zipWithIndex.foreach { case (v, i) =>
      assert(got(i.toLong)._1 == refCodes(v), s"codes mismatch at row $i")
      assert(got(i.toLong)._2 == refDtab(v), s"dtab mismatch at row $i")
    }
  }

  test("Sq8Codes/Sq8Cosine kernels == scala reference over 200 random vectors") {
    val dims = 16
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(dims,
      Gen.frequency(9 -> Gen.choose(-5.0f, 5.0f), 1 -> Gen.const(0.0f)))
    val rows = sample(vecGen, 200, seed = 21L)
    // random bounds with mn <= mx; dim 3 degenerate (mn == mx), dim 5
    // deliberately NARROW so some values clamp outside [0, 255]
    val lo = sample(Gen.choose(-4.0, 0.0), dims, seed = 22L).toArray
    val hi = lo.zip(sample(Gen.choose(0.1, 4.0), dims, seed = 23L))
      .map { case (l, s) => l + s }
    lo(3) = 1.5; hi(3) = 1.5
    lo(5) = -0.1; hi(5) = 0.1

    def refCodes(v: Seq[Float]): Seq[Int] =
      (0 until dims).map { d =>
        val span = hi(d) - lo(d)
        if (span <= 0.0) 0
        else {
          val c = Math.round(((v(d).toDouble - lo(d)) / span) * 255.0).toInt
          math.max(0, math.min(255, c))
        }
      }
    def refCosine(q: Seq[Float], codes: Seq[Int]): Double = {
      var dot = 0.0; var nq = 0.0; var nx = 0.0
      (0 until dims).foreach { d =>
        val qi = q(d).toDouble
        val xhat = lo(d) + codes(d) * ((hi(d) - lo(d)) / 255.0)
        dot += qi * xhat; nq += qi * qi; nx += xhat * xhat
      }
      if (math.sqrt(nq) == 0.0 || math.sqrt(nx) == 0.0) 0.0
      else dot / (math.sqrt(nq) * math.sqrt(nx))
    }

    val q = sample(vecGen, 1, seed = 24L).head
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v, q) }
      .toDF("id", "v", "q")
    val got = df.select(col("id"),
        VectorFunctions.sq8Codes(col("v"), lo, hi).as("codes"),
        VectorFunctions.sq8Cosine(col("q"),
          VectorFunctions.sq8Codes(col("v"), lo, hi), lo, hi).as("c"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Int](1), r.getDouble(2)))).toMap
    rows.zipWithIndex.foreach { case (v, i) =>
      val rc = refCodes(v)
      assert(got(i.toLong)._1 == rc, s"sq8 codes mismatch at row $i")
      assert(got(i.toLong)._2 == refCosine(q, rc), s"sq8 cosine mismatch at row $i")
    }
  }

  test("BinCodes/BinHamming kernels == scala reference over 200 random vectors (dims % 64 != 0)") {
    val dims = 70 // two words, second partial — exercises the tail mask
    val vecGen: Gen[Seq[Float]] = Gen.listOfN(dims,
      Gen.frequency(9 -> Gen.choose(-5.0f, 5.0f), 1 -> Gen.const(0.0f)))
    val rows = sample(vecGen, 200, seed = 31L)
    val th = sample(Gen.choose(-1.0, 1.0), dims, seed = 32L).toArray

    def refCodes(v: Seq[Float]): Seq[Long] = {
      val words = new Array[Long]((dims + 63) / 64)
      (0 until dims).foreach { d =>
        if (v(d).toDouble > th(d)) words(d / 64) |= (1L << (d % 64))
      }
      words.toSeq
    }
    def refHamming(a: Seq[Long], b: Seq[Long]): Int =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum

    val q = rows.head
    val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v, q) }
      .toDF("id", "v", "q")
    val got = df.select(col("id"),
        VectorFunctions.binCodes(col("v"), th).as("codes"),
        VectorFunctions.binHamming(
          VectorFunctions.binCodes(col("q"), th),
          VectorFunctions.binCodes(col("v"), th)).as("h"))
      .collect().map(r => r.getLong(0) ->
        ((r.getSeq[Long](1), r.getInt(2)))).toMap
    val qc = refCodes(q)
    rows.zipWithIndex.foreach { case (v, i) =>
      val rc = refCodes(v)
      assert(got(i.toLong)._1 == rc, s"bin codes mismatch at row $i")
      assert(got(i.toLong)._2 == refHamming(qc, rc), s"hamming mismatch at row $i")
    }
    // self-distance is zero through the whole kernel path
    assert(got(0L)._2 == 0)
  }

  test("SortedIntersectSize == array_intersect size over 300 random sorted sets") {
    val setGen: Gen[Seq[Long]] =
      Gen.listOf(Gen.choose(0L, 40L)).map(_.distinct.sorted)
    val pairGen = for { a <- setGen; b <- setGen } yield (a, b)
    val df = sample(pairGen, 300, seed = 7L).toDF("a", "b")
    val got = df.select(
      HashFunctions.jaccardSortedLong(col("a"), col("b")).as("nj"),
      (size(array_intersect(col("a"), col("b"))).cast("double") /
        greatest(lit(1.0),
          size(col("a")).cast("double") + size(col("b")).cast("double") -
            size(array_intersect(col("a"), col("b"))).cast("double"))).as("hj"),
      (size(col("a")) === 0 && size(col("b")) === 0).as("bothEmpty")).collect()
    got.foreach { r =>
      val expected = if (r.getBoolean(2)) 0.0 else r.getDouble(1)
      assert(math.abs(r.getDouble(0) - expected) < 1e-12,
        s"jaccard: native=${r.getDouble(0)} expected=$expected")
    }
  }

  test("MinhashSig == min-of-minhashMix HOF formulation over 300 random hash arrays") {
    // random 31-bit hash arrays incl. empty and single-element — the
    // per-row kernel must be bit-identical to the aggregation form it
    // replaced (min over the exploded array of each mixed family member)
    val arrGen: Gen[Seq[Long]] = Gen.frequency(
      8 -> Gen.nonEmptyListOf(Gen.choose(0L, (1L << 31) - 1)),
      1 -> Gen.listOfN(1, Gen.choose(0L, (1L << 31) - 1)),
      1 -> Gen.const(Seq.empty[Long]))
    val n = 8
    val df = sample(arrGen, 300, seed = 1234L).toDF("hs")
    def hofMin(i: Int) =
      array_min(transform(col("hs"), h => HashFunctions.minhashMix(h, i)))
    val cols = HashFunctions.minhashSig(col("hs"), n).as("sig") +:
      (0 until n).map(i => hofMin(i).as(s"e_$i"))
    val got = df.select(cols: _*).collect()
    got.foreach { r =>
      val sig = r.getSeq[Any](0)
      (0 until n).foreach { i =>
        val exp = if (r.isNullAt(i + 1)) null else r.getLong(i + 1)
        assert(sig(i) == exp, s"mh_$i: native=${sig(i)} hof=$exp hs row")
      }
    }
  }

  test("HashedWordShingles == HOF formulation over 300 random texts") {
    // word chars, separators, digits, casing, unicode-ish noise, empty
    // and separator-only strings — the tokenizer boundary space
    val wordGen = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar, 2 -> Gen.numChar
    )).map(_.mkString)
    val sepGen = Gen.oneOf(" ", "  ", ", ", "! ", "\t", "\n", " -- ", "…", "§")
    val textGen: Gen[String] = for {
      k <- Gen.choose(0, 12)
      ws <- Gen.listOfN(k, wordGen)
      ss <- Gen.listOfN(k + 1, sepGen)
    } yield (ss.head +: ws.zip(ss.tail).flatMap { case (w, s) => Seq(w, s) }).mkString
    for (n <- Seq(1, 2, 3)) {
      val df = sample(textGen, 300, seed = 99L + n).toDF("t")
      // the HOF formulation this kernel replaced, inlined verbatim
      def hof(text: org.apache.spark.sql.Column) = {
        val ts = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= "")
        val count = size(ts)
        val shingles = array_distinct(
          when(count < n, array(array_join(ts, " ")))
            .otherwise(transform(sequence(lit(1), count - lit(n - 1)),
              i => array_join(slice(ts, i, lit(n)), " "))))
        array_distinct(transform(shingles,
          s => conv(substring(md5(s), 1, 8), 16, 10).cast("long")
            .bitwiseAND(lit(0x7fffffffL))))
      }
      val rows = df.select(
        HashFunctions.hashedWordShingles(col("t"), n).as("native"),
        hof(col("t")).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
      }
    }
  }

  test("TokenStats fields == HOF formulations over 300 random texts") {
    import graft.functions.TextFunctions
    val wordGen = Gen.frequency(
      6 -> Gen.listOf(Gen.frequency(5 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar,
        1 -> Gen.numChar)).map(_.mkString),
      2 -> Gen.oneOf(TextFunctions.EnglishStopwords), // real stopword hits
      1 -> Gen.oneOf("ÉLAN", "daß", "…x…"))
    val textGen: Gen[String] = for {
      k <- Gen.choose(0, 15)
      ws <- Gen.listOfN(k, wordGen)
      ss <- Gen.listOfN(k, Gen.oneOf(" ", ", ", "!  ", "\n"))
    } yield ws.zip(ss).flatMap { case (w, s) => Seq(w, s) }.mkString
    val df = sample(textGen, 300, seed = 4242L).toDF("t")
    // the HOF formulations the TokenStats fields replaced, inlined
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    val stops = TextFunctions.EnglishStopwords
    val rows = df.select(
      TextFunctions.tokenCount(col("t")).as("nc"),
      size(toks(col("t"))).as("hc"),
      TextFunctions.distinctTokenCount(col("t")).as("ndc"),
      size(array_distinct(toks(col("t")))).as("hdc"),
      TextFunctions.meanTokenLength(col("t")).as("nml"),
      when(size(toks(col("t"))) === 0, lit(0.0)).otherwise(
        aggregate(transform(toks(col("t")), length(_).cast("double")),
          lit(0.0), _ + _) / size(toks(col("t")))).as("hml"),
      TextFunctions.stopwordRatio(col("t")).as("nsr"),
      when(size(toks(col("t"))) === 0, lit(0.0)).otherwise(
        size(filter(toks(col("t")), t => t.isin(stops: _*))).cast("double") /
          size(toks(col("t")))).as("hsr"),
      TextFunctions.gopherStopHits(col("t")).as("ngh"),
      size(filter(array_distinct(toks(col("t"))), t => t.isin(stops: _*))).as("hgh"),
      TextFunctions.subwordCount(col("t")).as("nsw"),
      aggregate(transform(toks(col("t")), t => ceil(length(t) / lit(4.0)).cast("long")),
        lit(0L), (acc, x) => acc + x).as("hsw")).collect()
    rows.foreach { r =>
      assert(r.getInt(0) == r.getInt(1), s"tokenCount ${r.getInt(0)} vs ${r.getInt(1)}")
      assert(r.getInt(2) == r.getInt(3), "distinctTokenCount")
      assert(r.getDouble(4) == r.getDouble(5), s"meanLen ${r.getDouble(4)} vs ${r.getDouble(5)}")
      assert(r.getDouble(6) == r.getDouble(7), "stopwordRatio")
      assert(r.getInt(8) == r.getInt(9), "gopherStopHits")
      assert(r.getLong(10) == r.getLong(11), "subwordCount")
    }
  }

  test("SimHashText / TokenFingerprint == HOF formulations over 300 random texts") {
    import graft.functions.{HashFunctions, TextFunctions}
    val textGen: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar, 1 -> Gen.numChar,
      2 -> Gen.oneOf(' ', '.', '!', '\n', 'É', 'ß'))).map(_.mkString)
    val df = sample(textGen, 300, seed = 777L).toDF("t")
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    // the per-bit HOF vote formulation (the pre-round-3 shape), as the
    // fully independent reference
    def hofSimhash(c: org.apache.spark.sql.Column, bits: Int) = {
      val hashes = transform(toks(c),
        t => conv(substring(md5(t), 1, 8), 16, 10).cast("long"))
      (0 until bits).map { b =>
        val votes = aggregate(hashes, lit(0L), (acc, h) =>
          acc + when(shiftright(h, b).bitwiseAND(lit(1L)) === 1L, lit(1L))
            .otherwise(lit(-1L)))
        when(votes > 0, lit(1L << b)).otherwise(lit(0L))
      }.reduce(_ + _)
    }
    def hofFingerprint(c: org.apache.spark.sql.Column) =
      md5(array_join(array_sort(array_distinct(toks(c))), " "))
    for (bits <- Seq(8, 32)) {
      val rows = df.select(
        HashFunctions.simhash(col("t"), bits).as("ns"),
        hofSimhash(col("t"), bits).as("hs"),
        TextFunctions.fingerprint(col("t")).as("nf"),
        hofFingerprint(col("t")).as("hf")).collect()
      rows.foreach { r =>
        assert(r.getLong(0) == r.getLong(1),
          s"simhash bits=$bits ${r.getLong(0)} vs ${r.getLong(1)}")
        assert(r.getString(2) == r.getString(3), "fingerprint")
      }
    }
  }

  test("Tokens / WordShinglesAll == HOF formulations over 300 random texts") {
    import graft.functions.{HashFunctions, TextFunctions}
    val textGen: Gen[String] = Gen.listOf(Gen.frequency(
      5 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar, 1 -> Gen.numChar,
      2 -> Gen.oneOf(' ', '.', '!', '\n', '\t', 'É', '§'))).map(_.mkString)
    val df = sample(textGen, 300, seed = 5150L).toDF("t")
    def hofToks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    def hofShinglesAll(c: org.apache.spark.sql.Column, n: Int) = {
      val ts = hofToks(c)
      val count = size(ts)
      when(count < n, array(array_join(ts, " ")))
        .otherwise(transform(sequence(lit(1), count - lit(n - 1)),
          i => array_join(slice(ts, i, lit(n)), " ")))
    }
    for (n <- Seq(1, 2, 4)) {
      val rows = df.select(
        TextFunctions.tokens(col("t")).as("nt"),
        hofToks(col("t")).as("ht"),
        HashFunctions.wordShinglesAll(col("t"), n).as("ns"),
        hofShinglesAll(col("t"), n).as("hs")).collect()
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"tokens ${r.getSeq[String](0)} vs ${r.getSeq[String](1)}")
        assert(r.getSeq[String](2) == r.getSeq[String](3),
          s"shinglesAll n=$n ${r.getSeq[String](2)} vs ${r.getSeq[String](3)}")
      }
    }
  }

  test("LangId == CASE-chain HOF formulation over 300 random texts") {
    import graft.functions.TextFunctions
    // bias towards real stopwords from the five language lists so the
    // argmax and tie paths are actually exercised
    val allStops = TextFunctions.LangStopwords.values.flatten.toSeq
    val wordGen = Gen.frequency(
      5 -> Gen.oneOf(allStops),
      3 -> Gen.listOf(Gen.alphaLowerChar).map(_.mkString),
      1 -> Gen.const(""))
    val textGen: Gen[String] = Gen.listOf(wordGen).map(_.mkString(" "))
    val df = sample(textGen, 300, seed = 31337L).toDF("t")
    def toks(c: org.apache.spark.sql.Column) =
      filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")
    // the CASE-chain formulation the kernel replaced, inlined verbatim
    def hofLangId(text: org.apache.spark.sql.Column) = {
      val ts = array_distinct(toks(text))
      val codes = TextFunctions.LangStopwords.keys.toSeq.sorted
      val hits: Map[String, org.apache.spark.sql.Column] = codes.map { c =>
        c -> size(filter(ts, t => t.isin(TextFunctions.LangStopwords(c): _*)))
      }.toMap
      val anyHit = codes.map(hits).reduce(_ + _) > 0
      val argmax = codes.zipWithIndex.foldRight(lit(codes.last)) {
        case ((c, i), elseCol) =>
          val laterCodes = codes.drop(i + 1)
          if (laterCodes.isEmpty) elseCol
          else {
            val geAllLater =
              laterCodes.map(l => hits(c) >= hits(l)).reduce(_ && _)
            when(geAllLater, lit(c)).otherwise(elseCol)
          }
      }
      when(!anyHit, lit("und")).otherwise(argmax)
    }
    val rows = df.select(
      TextFunctions.langId(col("t")).as("n"),
      hofLangId(col("t")).as("h")).collect()
    rows.foreach(r => assert(r.getString(0) == r.getString(1),
      s"native=${r.getString(0)} hof=${r.getString(1)}"))
  }

  test("HashedCharShingles == HOF formulation over 300 random texts") {
    val charGen = Gen.frequency(
      5 -> Gen.alphaLowerChar, 2 -> Gen.alphaUpperChar, 1 -> Gen.numChar,
      1 -> Gen.oneOf(' ', '\t', '\n', ' ', ' '), // incl. double/trailing runs
      1 -> Gen.oneOf('!', '.', '…', 'ß', 'É'))
    val textGen: Gen[String] = Gen.listOf(charGen).map(_.mkString)
    for (n <- Seq(1, 3, 5)) {
      val df = sample(textGen, 300, seed = 1234L + n).toDF("t")
      // the HOF formulation this kernel replaced, inlined verbatim
      def hof(text: org.apache.spark.sql.Column) = {
        val norm = trim(regexp_replace(lower(text), "\\s+", " "))
        val len = length(norm)
        val shingles = array_distinct(
          when(len <= n, array(norm))
            .otherwise(transform(sequence(lit(1), len - lit(n - 1)),
              i => substring(norm, i, lit(n)))))
        array_distinct(transform(shingles,
          s => conv(substring(md5(s), 1, 15), 16, 10).cast("long")))
      }
      val rows = df.select(
        HashFunctions.hashedCharShingles(col("t"), n).as("native"),
        hof(col("t")).as("hof")).collect()
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n native=${r.getSeq[Long](0)} hof=${r.getSeq[Long](1)}")
      }
    }
  }

  test("UnigramEncode kernel == driver-side Viterbi over 200 random (vocab, word) cases") {
    // random alphabet-3 words + random piece vocabularies with random
    // log-probs: the kernel's DP (incl. the longer-trailing-piece tie
    // rule and the unknown-char fallback) must match a straight-line
    // reference on every case — same algorithm, independently written
    val wordGen = for {
      n <- Gen.choose(1, 12)
      cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
    } yield cs.mkString
    val caseGen = for {
      word <- wordGen
      nPieces <- Gen.choose(1, 10)
      pieces <- Gen.listOfN(nPieces, for {
        l <- Gen.choose(1, 3)
        cs <- Gen.listOfN(l, Gen.oneOf('a', 'b', 'c'))
      } yield cs.mkString)
      // quantized log-probs avoid accidental near-ties from float noise
      // while still exercising EXACT ties (coarse grid → frequent)
      lps <- Gen.listOfN(nPieces, Gen.choose(1, 8).map(-_.toDouble))
    } yield (word, pieces.distinct.zip(lps).toMap)
    val cases = sample(caseGen, 200, seed = 77L)

    def refViterbi(w: String, lp: Map[String, Double]): Seq[String] = {
      val maxLen = if (lp.isEmpty) 1 else lp.keys.map(_.length).max
      val best = Array.fill(w.length + 1)(Double.NegativeInfinity)
      val back = new Array[Int](w.length + 1)
      best(0) = 0.0
      for (i <- 1 to w.length) {
        for (j <- math.max(0, i - maxLen) until i
             if best(j) != Double.NegativeInfinity) {
          lp.get(w.substring(j, i)).foreach { p =>
            if (best(j) + p > best(i)) { best(i) = best(j) + p; back(i) = j }
          }
        }
        if (best(i) == Double.NegativeInfinity) {
          best(i) = best(i - 1) + graft.functions.GraftHash.UnigramUnkLogp
          back(i) = i - 1
        }
      }
      var cur = w.length
      val out = scala.collection.mutable.ArrayBuffer.empty[String]
      while (cur > 0) { out.prepend(w.substring(back(cur), cur)); cur = back(cur) }
      out.toSeq
    }

    cases.foreach { case (word, vocab) =>
      val (ps, ls) = vocab.toSeq.sortBy(_._1).unzip
      val got = Seq(Tuple1(word)).toDF("text")
        .select(graft.functions.TextFunctions.unigramEncode(
          array(col("text")), ps, ls).as("p"))
        .collect().head.getSeq[String](0)
      val want = refViterbi(word, vocab)
      assert(got == want, s"word=$word vocab=$vocab got=$got want=$want")
    }
  }

  test("NfcNormalize == java.text.Normalizer over 300 random combining-mark strings; idempotent; codegen == interpreted") {
    val marks = Seq("́", "̈", "̊", "̧", "")
    val bases = Seq("a", "e", "o", "u", "C", "A", "n", " ", "1",
      "é", "ᄀ", "ᅡ", "ᆨ")
    val strGen: Gen[String] = for {
      n <- Gen.choose(0, 24)
      parts <- Gen.listOfN(n, for {
        b <- Gen.oneOf(bases); m <- Gen.oneOf(marks)
      } yield b + m)
    } yield parts.mkString
    val rows = sample(strGen, 300, seed = 7L)
    val got = rows.toDF("s")
      .select(graft.functions.TextFunctions.nfcNormalize(col("s")).as("n"))
      .collect().map(_.getString(0))
    rows.zip(got).foreach { case (s, n) =>
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(n == want, s"input=${s.map(_.toInt)}")
      // idempotence: normalizing the normalized form is the identity
      assert(java.text.Normalizer.isNormalized(n, java.text.Normalizer.Form.NFC))
    }
    // interpreted path (nullSafeEval) agrees with codegen
    import org.apache.spark.unsafe.types.UTF8String
    rows.foreach { s =>
      val viaEval = graft.functions.GraftHash
        .nfcNormalize(UTF8String.fromString(s)).toString
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
      assert(viaEval == want)
    }
  }

  test("UrlNormalize/UrlHost/RegistrableDomain == Spark-builtin formulation over 300 random URLs") {
    // independent reference: the same normalization rules written from
    // Spark builtins (the Column-level sibling of the DuckDB oracle) —
    // a kernel bug (wrong scan bound, missed tracker, unsorted params)
    // would diverge somewhere in this space
    import org.apache.spark.sql.Column
    val labelG = Gen.oneOf("ex", "News", "A", "sub2", "WWW", "bbc", "Tr8",
      "city")
    val hostG = for {
      n <- Gen.choose(1, 3)
      ls <- Gen.listOfN(n, labelG)
      sfx <- Gen.oneOf("", ".co.uk", ".com", ".IO", ".uk", ".github.io",
        ".kawasaki.jp", ".com.bd", ".ck", ".com.hk", ".blogspot.com")
    } yield ls.mkString(".") + sfx
    val paramG = Gen.oneOf("a=1", "B=2", "utm_source=x", "utm_x", "fbclid=z",
      "ref=h", "k", "", "a=1=2", "gclid=9", "Z=y")
    val urlG = for {
      scheme <- Gen.oneOf("http", "https", "HTTP", "Https", "ftp")
      host <- hostG
      port <- Gen.oneOf("", ":80", ":443", ":8080")
      path <- Gen.oneOf("", "/", "/A/b", "/x/y/", "/p.q")
      ps <- Gen.listOf(paramG)
      q <- Gen.oneOf("", "?")
      frag <- Gen.oneOf("", "#f", "#a#b", "#")
      query = if (ps.nonEmpty) "?" + ps.mkString("&") else q
    } yield s"$scheme://$host$port$path$query$frag"
    val urls = sample(urlG, 300, seed = 7L)
    val df = urls.toDF("u")
      .withColumn("nofrag", regexp_replace(col("u"), "#.*", ""))
      .withColumn("scheme", lower(substring_index(col("nofrag"), "://", 1)))
      .withColumn("rest", expr("substring(nofrag, instr(nofrag, '://') + 3)"))
      .withColumn("hostport",
        substring_index(substring_index(col("rest"), "/", 1), "?", 1))
      .withColumn("pathq", expr("substring(rest, length(hostport) + 1)"))
      .withColumn("host", lower(substring_index(col("hostport"), ":", 1)))
      .withColumn("port", when(expr("instr(hostport, ':')") > 0,
        expr("substring(hostport, instr(hostport, ':') + 1)")).otherwise(""))
      .withColumn("portnorm", when(col("port") === "" ||
          (col("scheme") === "http" && col("port") === "80") ||
          (col("scheme") === "https" && col("port") === "443"), "")
        .otherwise(concat(lit(":"), col("port"))))
      .withColumn("path", when(substring_index(col("pathq"), "?", 1) === "",
        "/").otherwise(substring_index(col("pathq"), "?", 1)))
      .withColumn("query", when(expr("instr(pathq, '?')") > 0,
        expr("substring(pathq, instr(pathq, '?') + 1)")).otherwise(""))
    val trackers = array(Seq("fbclid", "gclid", "msclkid", "ref", "ref_src",
      "igshid", "mc_eid").map(lit): _*)
    def pname(p: Column): Column = split(p, "=").getItem(0)
    val withKept = df.withColumn("kept", array_sort(filter(
      split(col("query"), "&"), p => p =!= "" &&
        !p.startsWith("utm_") && // bare utm_x params have name == p
        !pname(p).startsWith("utm_") &&
        !array_contains(trackers, pname(p)))))
    // independent PSL mirror from Spark HOFs over the same rule lists
    // (exception wins -> longest exact/wildcard -> default rule "*"),
    // the Column-level sibling of the DuckDB oracle's replay
    val psl = graft.functions.PublicSuffixList.builtin
    val exactArr = array(psl.exact.toSeq.sorted.map(lit): _*)
    val wildArr = array(psl.wildcard.toSeq.sorted.map(lit): _*)
    val excArr = array(psl.exception.toSeq.sorted.map(lit): _*)
    def suffixK(k: Column): Column =
      concat_ws(".", slice(col("ls"), -k, k))
    val checked = withKept
      .withColumn("want_norm", concat(col("scheme"), lit("://"), col("host"),
        col("portnorm"), col("path"),
        when(size(col("kept")) > 0,
          concat(lit("?"), array_join(col("kept"), "&"))).otherwise("")))
      .withColumn("ls", split(col("host"), "\\."))
      .withColumn("nl", size(col("ls")))
      .withColumn("exck", array_max(filter(sequence(lit(1), col("nl")),
        k => array_contains(excArr, suffixK(k)))))
      .withColumn("bestk", greatest(
        coalesce(array_max(filter(sequence(lit(1), col("nl")),
          k => array_contains(exactArr, suffixK(k)))), lit(1)),
        coalesce(array_max(filter(sequence(lit(1), col("nl")),
          // guard: slice with zero length (k=1) is invalid in Spark
          k => when(k >= 2, array_contains(wildArr,
            concat_ws(".", slice(col("ls"), lit(1) - k, k - lit(1)))))
            .otherwise(lit(false)))), lit(1))))
      .withColumn("psl_len", when(col("exck").isNotNull, col("exck") - 1)
        .otherwise(col("bestk")))
      .withColumn("want_dom",
        when(col("nl") <= col("psl_len") + 1, col("host"))
          .otherwise(concat_ws(".",
            slice(col("ls"), -(col("psl_len") + lit(1)),
              col("psl_len") + lit(1)))))
      .select(col("u"),
        graft.functions.UrlFunctions.urlNormalize(col("u")).as("got_norm"),
        col("want_norm"),
        graft.functions.UrlFunctions.urlHost(col("u")).as("got_host"),
        col("host").as("want_host"),
        col("want_dom"))
      .collect()
    checked.foreach { r =>
      assert(r.getString(1) == r.getString(2),
        s"normalize ${r.getString(0)}: got ${r.getString(1)} want ${r.getString(2)}")
      assert(r.getString(3) == r.getString(4),
        s"host ${r.getString(0)}: got ${r.getString(3)} want ${r.getString(4)}")
      // domain leg: the Column-HOF mirror vs the driver algorithm over
      // the SAME (snapshot) rules — rule-list-independent, so a vendored
      // public_suffix_list.dat refresh can't break this property test.
      // The codegen kernel (authoritative rules) is case-gated in UrlSpec.
      assert(r.getString(5) == graft.functions.PublicSuffixList
        .registrableDomain(r.getString(4), psl),
        s"domain ${r.getString(0)}: mirror ${r.getString(5)} vs driver algo")
    }
  }
}
