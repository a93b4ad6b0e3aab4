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
}
