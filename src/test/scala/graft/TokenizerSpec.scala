package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFunctions
import graft.ops.CorpusOps

/** Unigram-LM (SentencePiece-style) trainer + Viterbi encoder:
  * equality with a driver-side reference implementation, coverage and
  * determinism properties.
  */
class TokenizerSpec extends SparkSuite {

  import spark.implicits._

  private val corpus = Seq(
    (1L, "the theme of the thesis"),
    (2L, "the theme is these themes"),
    (3L, "this thesis uses the theme"),
    (4L, "these themes use this thesis"))

  /** Straight-line reference: same seed rule, same hard-EM, same
    * Viterbi tie-breaks, all in plain Scala on the driver.
    */
  private def referenceTrain(docs: Seq[String], vocabSize: Int,
      maxPieceLen: Int, emRounds: Int, seedFactor: Int)
      : Seq[(String, Long, Double)] = {
    val words = docs.flatMap(_.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }.toSeq
    val subCounts = scala.collection.mutable.Map.empty[String, Long]
    for ((w, f) <- words; s <- 0 until w.length;
         l <- 1 to math.min(maxPieceLen, w.length - s))
      subCounts(w.substring(s, s + l)) =
        subCounts.getOrElse(w.substring(s, s + l), 0L) + f
    val singles = subCounts.filter(_._1.length == 1).toSeq
    val seedMulti = subCounts.filter(_._1.length > 1).toSeq
      .sortBy { case (p, c) => (-c, p) }.take(seedFactor * vocabSize)
    val singleSet = singles.map(_._1).toSet

    def viterbi(w: String, lp: Map[String, Double], maxLen: Int): Seq[String] = {
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

    var model = (singles ++ seedMulti).sortBy { case (p, c) => (-c, p) }
    for (_ <- 1 to emRounds) {
      val total = math.max(1L, model.map(_._2).sum).toDouble
      val lp = model.map { case (p, c) => p -> math.log(c / total) }.toMap
      val maxLen = model.map(_._1.length).max
      val counts = scala.collection.mutable.Map.empty[String, Long]
      for ((w, f) <- words; p <- viterbi(w, lp, maxLen))
        counts(p) = counts.getOrElse(p, 0L) + f
      model = model.flatMap { case (p, _) =>
        val c = counts.getOrElse(p, 0L)
        if (singleSet.contains(p)) Some((p, math.max(c, 1L)))
        else if (c > 0L) Some((p, c)) else None
      }.sortBy { case (p, c) => (-c, p) }
    }
    val keptS = model.filter(m => singleSet.contains(m._1))
    val keptM = model.filterNot(m => singleSet.contains(m._1))
      .take(math.max(0, vocabSize - keptS.size))
    val fin = (keptS ++ keptM).sortBy { case (p, c) => (-c, p) }
    val total = math.max(1L, fin.map(_._2).sum).toDouble
    fin.map { case (p, c) => (p, c, math.log(c / total)) }
  }

  test("unigramTrain matches the driver-side reference, invariant to partitioning") {
    val expected = referenceTrain(corpus.map(_._2), vocabSize = 12,
      maxPieceLen = 4, emRounds = 2, seedFactor = 4)
    for (parts <- Seq(1, 5)) {
      val got = CorpusOps.unigramTrain(
        corpus.toDF("doc_id", "text").repartition(parts), "doc_id", "text",
        vocabSize = 12, maxPieceLen = 4, emRounds = 2, seedFactor = 4)
        .collect().map(r => (r.getString(1), r.getLong(2), r.getDouble(3))).toSeq
      assert(got == expected, s"parts=$parts\ngot=$got\nexp=$expected")
    }
    // pieces actually compress: some multi-char piece must survive
    assert(expected.exists(_._1.length > 1))
  }

  test("unigramEncode: segmentation is exact cover; model kernel handles unknowns") {
    val trained = CorpusOps.unigramTrain(corpus.toDF("doc_id", "text"),
      "doc_id", "text", vocabSize = 12, maxPieceLen = 4, emRounds = 2)
      .collect()
    val pieces = trained.map(_.getString(1)).toSeq
    val logps = trained.map(_.getDouble(3)).toSeq
    // every word re-assembles exactly from its pieces
    val docs = corpus.toDF("doc_id", "text")
    val enc = CorpusOps.unigramEncodeDocs(docs, "doc_id", "text", pieces, logps)
      .select(col("doc_id"), concat_ws("", col("pieces")).as("joined"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val plain = docs
      .select(col("doc_id"),
        concat_ws("", TextFunctions.tokens(col("text"))).as("joined"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(enc == plain)
    // unknown chars (never seen in training) fall back to single-char
    // pieces instead of failing
    val odd = Seq((9L, "zq the")).toDF("doc_id", "text")
    val oddEnc = CorpusOps.unigramEncodeDocs(odd, "doc_id", "text", pieces, logps)
      .collect().head.getSeq[String](1)
    assert(oddEnc.take(2) == Seq("z", "q") || oddEnc.head == "zq")
    assert(oddEnc.mkString == "zqthe")
  }

  test("unigramEncode prefers higher-probability segmentations") {
    // vocab where "ab"+"cd" beats "a"+"bcd" by log-prob
    val pieces = Seq("a", "b", "c", "d", "ab", "cd", "bcd")
    val logps = Seq(-3.0, -3.0, -3.0, -3.0, -0.5, -0.5, -2.5)
    val got = Seq((1L, "abcd")).toDF("id", "text")
      .select(TextFunctions.unigramEncode(TextFunctions.tokens(col("text")),
        pieces, logps).as("p"))
      .collect().head.getSeq[String](0)
    assert(got == Seq("ab", "cd")) // -1.0 beats a+bcd (-5.5) and chars (-12)
  }
}
