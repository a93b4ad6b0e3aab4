package graft

import java.sql.Timestamp
import graft.ops.FunnelOps

/** FunnelOps semantics on handcrafted event streams: strict step
  * ordering (a purchase BEFORE the click must not convert), first-reach
  * mins, and cohort-week retention arithmetic.
  */
class FunnelSpec extends SparkSuite {

  import spark.implicits._

  private def ts(s: Long) = new Timestamp(s * 1000L)

  test("funnel: strictly-sequential first-reach semantics") {
    // u1: view(10) click(20) purchase(30)        -> converts all 3 steps
    // u2: view(10) purchase(15) click(20)        -> purchase BEFORE the
    //     click: step 3 must NOT count (no purchase after first click)
    // u3: click(5) view(10) click(12)            -> the click at 5 is
    //     before the view; the later click at 12 converts step 2
    // u4: purchase(1)                            -> never views: counts nowhere
    val events = Seq(
      ("u1", "view", 10L), ("u1", "click", 20L), ("u1", "purchase", 30L),
      ("u2", "view", 10L), ("u2", "purchase", 15L), ("u2", "click", 20L),
      ("u3", "click", 5L), ("u3", "view", 10L), ("u3", "click", 12L),
      ("u4", "purchase", 1L)
    ).map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val out = FunnelOps.funnel(events, "user_id", "event_type", "ts",
        Seq("view", "click", "purchase"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    assert(out.toSeq === Seq(
      (1L, "view", 3L, 1.0),
      (2L, "click", 3L, 1.0),     // u1, u2, u3 all click after first view
      (3L, "purchase", 1L, 0.333333) // only u1 purchases after the click
    ))
  }

  test("funnel: single-step degenerates to a distinct-user count") {
    val events = Seq(("a", "view", ts(1)), ("a", "view", ts(2)),
      ("b", "view", ts(3)), ("c", "other", ts(4)))
      .toDF("user_id", "event_type", "ts")
    val out = FunnelOps.funnel(events, "user_id", "event_type", "ts",
      Seq("view")).collect()
    assert(out.length === 1)
    assert(out.head.getLong(2) === 2L)
    assert(out.head.getDouble(3) === 1.0)
  }

  test("transitions: lead pairs per user, ts ties broken by id, shares per from_type") {
    // u1: a(1) b(2) a(3) -> a>b, b>a ; u2: ts tie at 5 resolved by id
    // order (id 20 then 21): b>b, then b>c at 6
    val events = Seq(
      ("u1", "a", 1L, 10L), ("u1", "b", 2L, 11L), ("u1", "a", 3L, 12L),
      ("u2", "b", 5L, 20L), ("u2", "b", 5L, 21L), ("u2", "c", 6L, 22L),
      ("u3", "z", 9L, 30L) // single event: no transition
    ).map { case (u, t, s, i) => (u, t, ts(s), i) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = FunnelOps.transitions(events, "user_id", "event_type",
        "ts", "event_id")
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2),
        r.getDouble(3)))
    // from_type b has 3 outgoing transitions total (across users), so
    // each b>* share is 1/3
    assert(out.toSeq === Seq(
      ("a", "b", 1L, 1.0),
      ("b", "a", 1L, 0.333333), ("b", "b", 1L, 0.333333),
      ("b", "c", 1L, 0.333333)
    ).sortBy(t => (t._1, t._2)))
  }

  test("topPaths: first-pathLen prefix, deterministic count-desc/path-asc order") {
    val events = Seq(
      ("u1", "a", 1L, 1L), ("u1", "b", 2L, 2L), ("u1", "c", 3L, 3L),
      ("u1", "d", 4L, 4L), // 4th event ignored at pathLen=3
      ("u2", "a", 1L, 5L), ("u2", "b", 2L, 6L), ("u2", "c", 3L, 7L),
      ("u3", "a", 1L, 8L), ("u3", "b", 2L, 9L), // short path kept
      ("u4", "x", 1L, 10L)
    ).map { case (u, t, s, i) => (u, t, ts(s), i) }
      .toDF("user_id", "event_type", "ts", "event_id")
    val out = FunnelOps.topPaths(events, "user_id", "event_type", "ts",
        "event_id", pathLen = 3, topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(out.toSeq === Seq(("a>b>c", 2L), ("a>b", 1L)))
  }

  test("rollingFeatures: trailing range frame, symmetric ties, per-user isolation") {
    val events = Seq(
      ("u1", 0L, 1L, 10.0), ("u1", 1000L, 2L, 20.0), ("u1", 2000L, 3L, 5.0),
      ("u2", 5000L, 4L, 1.0), ("u2", 5000L, 5L, 2.0), // ts tie
      ("u3", 900L, 6L, 7.0)                           // other user at overlapping ts
    ).toDF("user_id", "ms", "event_id", "value")
    val out = FunnelOps.rollingFeatures(events, "user_id", "ms", "value",
        "event_id", windowMs = 1500L)
      .collect().map(r => r.getLong(1) -> (r.getLong(3), r.getDouble(4)))
      .toMap
    assert(out(1L) == ((1L, 10.0)))
    assert(out(2L) == ((2L, 30.0)))        // 0 is within [-500, 1000]
    assert(out(3L) == ((2L, 25.0)))        // 0 aged out of [500, 2000]
    // equal-ts rows see each other symmetrically — no tie-break needed
    assert(out(4L) == ((2L, 3.0)))
    assert(out(5L) == ((2L, 3.0)))
    assert(out(6L) == ((1L, 7.0)))         // users isolate
  }

  test("retention: cohort by first signup week, offsets >= 0 only") {
    val wk = 604800L
    // uA signs up week 0, active weeks 0,1,3; uB signs up week 0,
    // active week 0 only; uC signs up week 1, active weeks 1,2.
    // uA also has a PRE-signup event (week 0 is its first signup week
    // anyway); uD never signs up -> in no cohort.
    val events = Seq(
      ("uA", "signup", 0L * wk + 100), ("uA", "view", 1L * wk + 5),
      ("uA", "click", 3L * wk + 9),
      ("uB", "signup", 0L * wk + 7), ("uB", "view", 0L * wk + 8),
      ("uC", "signup", 1L * wk + 3), ("uC", "view", 2L * wk + 4),
      ("uD", "view", 0L * wk + 1)
    ).map { case (u, t, s) => (u, t, ts(s)) }
      .toDF("user_id", "event_type", "ts")
    val out = FunnelOps.retention(events, "user_id", "event_type", "ts",
        cohortType = "signup")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(out.toSeq === Seq(
      (0L, 0L, 2L, 2L, 1.0),  // both uA,uB active in signup week
      (0L, 1L, 1L, 2L, 0.5),  // uA
      (0L, 3L, 1L, 2L, 0.5),  // uA
      (1L, 0L, 1L, 1L, 1.0),  // uC
      (1L, 1L, 1L, 1L, 1.0)   // uC
    ))
  }
}
