package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.FilterOps
import graft.ops.FilterOps._

/** ScalaCheck-generated F2 predicate cases vs the Python-semantics model
  * (FIXTURES.md §5): random property bags × random operator predicates,
  * one Spark filter per predicate over a fixed generated table.
  */
class PropertySpec extends SparkSuite {

  import spark.implicits._

  private val rowGen: Gen[(Long, Option[String], Option[Long])] = for {
    id <- Gen.choose(1L, 1000000L)
    s <- Gen.option(Gen.oneOf("alpha", "beta", "gamma", "alphabet", ""))
    n <- Gen.option(Gen.choose(-5L, 50L))
  } yield (id, s, n)

  private val predGen: Gen[(String, Pred)] = {
    val strPred = Gen.oneOf[Pred](
      Eq("alpha"), Ne("beta"), Contains("a"), Contains("bet"),
      In(Seq("alpha", "gamma")), Nin(Seq("beta", "")))
    val numPred = for {
      v <- Gen.choose(-5L, 50L)
      p <- Gen.oneOf[Pred](Gt(v), Gte(v), Lt(v), Lte(v), Ne(v),
        In(Seq(v, v + 1)), Nin(Seq(v)))
    } yield p
    Gen.oneOf(strPred.map("s" -> _), numPred.map("n" -> _))
  }

  private def sample[A](g: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(seed + i)))

  private def model(s: Option[String], n: Option[Long], field: String, p: Pred): Boolean = {
    val vs: Option[String] = if (field == "s") s else None
    val vn: Option[Long] = if (field == "n") n else None
    p match {
      case Eq(x) => if (field == "s") vs.contains(x) else vn.contains(x)
      case Gt(x: Long) => vn.exists(_ > x)
      case Gte(x: Long) => vn.exists(_ >= x)
      case Lt(x: Long) => vn.exists(_ < x)
      case Lte(x: Long) => vn.exists(_ <= x)
      case Ne(x) => if (field == "s") !vs.contains(x) else !vn.contains(x)
      case In(xs) => if (field == "s") vs.exists(xs.contains) else vn.exists(xs.contains)
      case Nin(xs) => if (field == "s") !vs.exists(xs.contains) else !vn.exists(xs.contains)
      case Contains(x) => vs.exists(_.contains(x))
      case _ => false
    }
  }

  test("80 generated predicates match the model on a 120-row generated bag") {
    val rows = sample(rowGen, 120, seed = 42L).distinct
    val df = rows.toDF("id", "s", "n").cache()
    val preds = sample(predGen, 80, seed = 4242L)
    assert(rows.nonEmpty && preds.size == 80)
    preds.zipWithIndex.foreach { case ((field, p), i) =>
      val got = df.filter(FilterOps.predicate(field, p))
        .select("id").collect().map(_.getLong(0)).toSet
      val want = rows.filter { case (_, s, n) => model(s, n, field, p) }
        .map(_._1).toSet
      assert(got == want, s"case #$i: $field $p")
    }
    df.unpersist()
  }

  test("packSequences tiles generated corpora for arbitrary sizes and seqLens") {
    val caseGen: Gen[(Long, Seq[Long])] = for {
      seqLen <- Gen.choose(1L, 50L)
      n <- Gen.choose(1, 40)
      sizes <- Gen.listOfN(n, Gen.frequency(
        (8, Gen.choose(0L, 30L)),       // typical docs incl. empty
        (2, Gen.choose(100L, 300L))))   // oversized: spans many sequences
    } yield (seqLen, sizes)

    sample(caseGen, 12, seed = 20260813L).zipWithIndex.foreach {
      case ((seqLen, sizes), i) =>
        val docs = sizes.zipWithIndex
          .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "n_tokens")
        val rows = graft.ops.ShardOps
          .packSequences(docs.repartition(5), "doc_id", "n_tokens", seqLen)
          .select("doc_id", "seq_id", "doc_start", "doc_end", "seq_pos")
          .collect()
          .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
            r.getLong(4)))
        val total = sizes.sum
        // doc-side tiling: each doc's slices cover [0, ntok) contiguously
        rows.groupBy(_._1).foreach { case (id, slices) =>
          val sorted = slices.sortBy(_._2)
          assert(sorted.head._3 == 0L, s"case #$i doc $id")
          assert(sorted.last._4 == sizes(id.toInt), s"case #$i doc $id")
          sorted.sliding(2).foreach {
            case Array(a, b) =>
              assert(a._4 == b._3 && b._2 == a._2 + 1, s"case #$i doc $id")
            case _ =>
          }
        }
        // seq-side tiling: every sequence except the last holds seqLen
        val perSeq = rows.groupBy(_._2).view
          .mapValues(_.map(s => s._4 - s._3).sum).toMap
        val lastSeq = if (total == 0) -1L else (total - 1) / seqLen
        perSeq.foreach { case (seq, tokens) =>
          if (seq < lastSeq) assert(tokens == seqLen, s"case #$i seq $seq")
          else assert(tokens == total - seq * seqLen, s"case #$i last seq")
        }
        // zero-token docs emit nothing; all others appear
        val emitted = rows.map(_._1).toSet
        val expected = sizes.zipWithIndex.collect {
          case (t, id) if t > 0 => id.toLong
        }.toSet
        assert(emitted == expected, s"case #$i emitted set")
    }
  }
}
