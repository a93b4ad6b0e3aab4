package graft

import org.apache.spark.sql.functions._

import graft.ops.FilterOps
import graft.ops.FilterOps._

/** F2 predicate evaluator vs a driver-side model implementation
  * (FIXTURES.md §5 names this as the ScalaCheck target; semantics from
  * reference search/vector.py:351-381).
  */
class FilterOpsSpec extends SparkSuite {

  import spark.implicits._

  // property bags: (id, str value, long value) with nulls
  private val rows: Seq[(Long, Option[String], Option[Long])] = Seq(
    (1L, Some("alpha"), Some(10L)),
    (2L, Some("beta"), Some(20L)),
    (3L, None, Some(30L)),
    (4L, Some("alphabet"), None),
    (5L, None, None)
  )
  private lazy val df = rows.toDF("id", "s", "n")

  /** Python-semantics model evaluator (None != v is True, etc.). */
  private def model(s: Option[String], n: Option[Long], field: String, p: Pred): Boolean = {
    val v: Option[Any] = if (field == "s") s else n
    p match {
      case Eq(x) => v.contains(x)
      case Gt(x) => v.exists(a => cmp(a, x) > 0)
      case Gte(x) => v.exists(a => cmp(a, x) >= 0)
      case Lt(x) => v.exists(a => cmp(a, x) < 0)
      case Lte(x) => v.exists(a => cmp(a, x) <= 0)
      case Ne(x) => !v.contains(x) // None != x is True
      case In(xs) => v.exists(xs.contains)
      case Nin(xs) => !v.exists(xs.contains)
      case Contains(x) => v.exists(_.toString.contains(x))
    }
  }
  private def cmp(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => x.compareTo(y)
    case (x: Long, y: Int) => x.compareTo(y.toLong)
    case (x: String, y: String) => x.compareTo(y)
    case _ => 0
  }

  private def run(field: String, p: Pred): Set[Long] =
    df.filter(FilterOps.predicate(field, p)).select("id").collect().map(_.getLong(0)).toSet

  private def expected(field: String, p: Pred): Set[Long] =
    rows.filter { case (_, s, n) => model(s, n, field, p) }.map(_._1).toSet

  private val cases = Seq[(String, Pred)](
    ("s", Eq("alpha")), ("s", Ne("alpha")), ("s", Contains("alpha")),
    ("s", Contains("bet")), ("s", In(Seq("alpha", "beta"))),
    ("s", Nin(Seq("alpha"))), ("n", Gt(10L)), ("n", Gte(20L)),
    ("n", Lt(30L)), ("n", Lte(10L)), ("n", Ne(20L)), ("n", In(Seq(10L, 30L))),
    ("n", Nin(Seq(10L, 20L, 30L)))
  )

  cases.foreach { case (f, p) =>
    test(s"predicate $f $p matches Python-semantics model") {
      assert(run(f, p) == expected(f, p))
    }
  }

  test("$ne passes NULL actual (Python None != v)") {
    assert(run("s", Ne("zzz")).contains(3L))
    assert(run("s", Ne("zzz")).contains(5L))
  }

  test("$nin passes NULL actual") {
    assert(run("n", Nin(Seq(10L))) == Set(2L, 3L, 4L, 5L))
  }

  test("comparisons fail on NULL actual") {
    assert(!run("n", Gt(0L)).contains(4L))
    assert(!run("n", Lt(100L)).contains(5L))
  }

  test("predicates conjunction") {
    val got = df.filter(FilterOps.predicates(Map(
      "s" -> Contains("alpha"), "n" -> Gte(10L)
    ))).select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L))
  }

  test("memoryType treats missing as semantic") {
    val d = Seq((1L, Some("episodic")), (2L, None), (3L, Some("semantic")))
      .toDF("id", "mt")
    val got = d.filter(FilterOps.memoryType(col("mt"), "semantic"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(2L, 3L))
  }

  test("validAtPointInTime permissive NULL valid_at") {
    val d = Seq(
      (1L, Some(100L), Some(200L)), // valid at 150
      (2L, Some(100L), None), // open-ended
      (3L, None, None), // NULL valid_at always passes
      (4L, Some(160L), None), // not yet valid at 150
      (5L, Some(100L), Some(150L)) // invalid exactly at pit (exclusive)
    ).toDF("id", "va", "ia")
    val got = d.filter(FilterOps.validAtPointInTime(col("va"), col("ia"), 150L))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got == Set(1L, 2L, 3L))
  }

  test("scopeFilter conjunction and empty") {
    val d = Seq(("u1", "a1"), ("u1", "a2"), ("u2", "a1")).toDF("user_id", "agent_id")
    assert(d.filter(FilterOps.scopeFilter(Map("user_id" -> "u1", "agent_id" -> "a1"))).count() == 1)
    assert(d.filter(FilterOps.scopeFilter(Map.empty)).count() == 3)
  }
}
