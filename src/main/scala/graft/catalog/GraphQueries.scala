package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{GraphOps, ScoringOps}
import Tables._

/** Graph traversal / merge / topology queries over FK-derived edges from
  * the TPC-H-ish tables (J1-J3, J7, J15/R1, A5, A6, R2; SURVEY §2.3,
  * §2.5-2.6). Edge model: lineitem gives Memory→Entity-shaped edges
  * (order "contains" part), orders give customer→order "placed" edges
  * and per-customer "next order" chains.
  */
object GraphQueries {

  /** All FK edges in one typed edge table (the library's edge model). */
  private def fkEdges(s: SparkSession, dir: String): DataFrame = {
    val li = load(s, dir, "lineitem")
    val ord = load(s, dir, "orders")
    val contains = li.select(
      col("l_orderkey").as("src"), col("l_partkey").as("dst"),
      lit("contains").as("edge_type"))
    val placed = ord.select(
      col("o_custkey").as("src"), col("o_orderkey").as("dst"),
      lit("placed").as("edge_type"))
    contains.unionByName(placed)
  }

  /** Per-customer "next order by date" chain edges (linear chains). */
  private def nextOrderEdges(s: SparkSession, dir: String): DataFrame = {
    val ord = load(s, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    ord
      .withColumn("nxt", lead(col("o_orderkey"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("o_orderkey").as("src"), col("nxt").as("dst"),
        lit("next_order").as("edge_type"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_graph_expand" -> { (s, dir) =>
      // J1/J2 — typed 1-hop expansion (order → contained parts)
      GraphOps.expand(fkEdges(s, dir), "contains")
        .filter(col("src") < 200)
        .distinct()
        .orderBy(col("src"), col("dst"))
    },
    "q_graph_two_hop" -> { (s, dir) =>
      // J3 — customer -placed-> order -contains-> part, distinct
      GraphOps.twoHop(fkEdges(s, dir), "placed", "contains")
        .filter(col("src") < 50)
        .orderBy(col("src"), col("mid"), col("dst"))
    },
    "q_graph_var_paths" -> { (s, dir) =>
      // J7 — variable-length BFS along per-customer order chains from
      // each low-key customer's first order, min-depth semantics
      val edges = nextOrderEdges(s, dir)
      val ord = load(s, dir, "orders")
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      val seeds = ord.filter(col("o_custkey") < 10)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_orderkey").as("root"))
      GraphOps.varLengthPaths(edges, "next_order", seeds, maxDepth = 4)
        .orderBy(col("root"), col("depth"), col("node"))
    },
    "q_graph_merge" -> { (s, dir) =>
      // J15/R1 — hybrid merge: price-scored set ∪ size-scored set with
      // agreement bonus 0.1
      val ord = load(s, dir, "orders")
      val li = load(s, dir, "lineitem")
      val vector = ord
        .select(col("o_orderkey").as("id"), (col("o_totalprice") / 500000.0).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(100)
      val graph = li.groupBy(col("l_orderkey").as("id"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("id"), (col("cnt") / 10.0).as("score"))
        .orderBy(col("score").desc, col("id").asc)
        .limit(100)
      GraphOps.mergeResults(vector, graph, "id", agreementBonus = 0.1)
        .select(col("id"), round(col("score"), 6).as("score"), col("source"))
        .orderBy(col("id"))
    },
    "q_graph_topology" -> { (s, dir) =>
      // A5 — topology score over order-contains-part edges
      val he = fkEdges(s, dir).filter(col("edge_type") === "contains")
      GraphOps.topologyScores(he)
        .select(col("mem"), col("degree").cast("long").as("degree"),
          round(col("shared_ratio"), 6).as("shared_ratio"),
          round(col("topology_score"), 6).as("topology_score"))
        .orderBy(col("mem"))
    },
    "q_graph_reinforcement" -> { (s, dir) =>
      // A6 — structural reinforcement; every 3rd order has NULL
      // importance (exercises the reference's missing→1.0 default).
      // Importance is a dyadic rational (k/128) so the avg's sum is
      // EXACT in double regardless of summation order — the oracle
      // can't drift across a round() boundary.
      val ord = load(s, dir, "orders")
      val mem = ord.select(
        col("o_orderkey").as("id"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("created_at"),
        when(col("o_orderkey") % 3 === 0, lit(null: java.lang.Double))
          .otherwise((col("o_orderkey") % 97).cast("double") / 128.0).as("importance"))
      val he = fkEdges(s, dir).filter(col("edge_type") === "contains")
      // no round(): the dyadic inputs make both engines' doubles
      // bit-identical, and rounding would REINTRODUCE a mismatch (Spark
      // rounds the shortest-decimal repr, DuckDB the raw binary — they
      // disagree when the value sits on a .…5 boundary)
      GraphOps.reinforcement(mem, he, gamma = 0.3)
        .select(col("mem"), col("avg_child_importance"), col("reinforcement"))
        .orderBy(col("mem"))
    },
    "q_score_boost" -> { (s, dir) =>
      // R2 — topology boost applied to a base score
      val ord = load(s, dir, "orders")
      val he = fkEdges(s, dir).filter(col("edge_type") === "contains")
      val topo = GraphOps.topologyScores(he)
        .select(col("mem").as("o_orderkey"), col("topology_score"))
      ord.join(topo, Seq("o_orderkey"), "left")
        .select(
          col("o_orderkey"),
          round(
            ScoringOps.topologyBoost(col("o_totalprice") / 500000.0, col("topology_score"), 0.2),
            6).as("boosted"))
        .orderBy(col("o_orderkey"))
    },
    "q_score_composite" -> { (s, dir) =>
      // R5 — composite importance score with recency decay + log-capped
      // frequency; NULL importance on every 3rd order defaults to 1.0
      val Now = 1767225600000L // 2026-01-01T00:00:00Z
      val ord = load(s, dir, "orders")
      val li = load(s, dir, "lineitem")
      val freq = li.groupBy(col("l_orderkey").as("o_orderkey"))
        .agg(count(lit(1)).as("access_count"))
      val base = ord.join(freq, Seq("o_orderkey"), "left")
        .withColumn("access_count", coalesce(col("access_count"), lit(0L)))
        .withColumn("created_ms", unix_millis(col("o_orderdate").cast("timestamp")))
      base.select(
          col("o_orderkey"),
          round(
            ScoringOps.compositeScore(
              similarity = col("o_totalprice") / 600000.0,
              recency = ScoringOps.recencyScore(col("created_ms"), Now, 0.01),
              frequency = ScoringOps.frequencyScore(col("access_count")),
              importance = when(col("o_orderkey") % 3 === 0, lit(null: java.lang.Double))
                .otherwise(col("o_totalprice") / 600000.0),
              topology = lit(0.0)
            ), 6).as("score"))
        .orderBy(col("o_orderkey"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_graph_expand" ->
      """SELECT DISTINCT l_orderkey AS src, l_partkey AS dst FROM lineitem
        |WHERE l_orderkey < 200 ORDER BY src, dst""".stripMargin,
    "q_graph_two_hop" ->
      """SELECT DISTINCT o.o_custkey AS src, o.o_orderkey AS mid, l.l_partkey AS dst
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE o.o_custkey < 50 ORDER BY src, mid, dst""".stripMargin,
    "q_graph_var_paths" ->
      """WITH RECURSIVE e AS (SELECT o_orderkey AS src,
        |    lead(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS dst
        |  FROM orders),
        |edges AS (SELECT src, dst FROM e WHERE dst IS NOT NULL),
        |seeds AS (SELECT o_orderkey AS root FROM (
        |    SELECT o_orderkey, row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
        |    FROM orders WHERE o_custkey < 10) WHERE rn = 1),
        |rec AS (
        |  SELECT root, root AS node, 0 AS depth FROM seeds
        |  UNION ALL
        |  SELECT rec.root, edges.dst AS node, rec.depth + 1 FROM rec
        |  JOIN edges ON rec.node = edges.src WHERE rec.depth < 4)
        |SELECT root, node, depth FROM rec WHERE depth > 0
        |ORDER BY root, depth, node""".stripMargin,
    "q_graph_merge" ->
      """WITH v AS (SELECT o_orderkey AS id, o_totalprice / 500000.0 AS v_score
        |  FROM orders ORDER BY v_score DESC, id ASC LIMIT 100),
        |g AS (SELECT l_orderkey AS id, count(*)::DOUBLE / 10.0 AS g_score
        |  FROM lineitem GROUP BY l_orderkey ORDER BY g_score DESC, id ASC LIMIT 100),
        |m AS (SELECT coalesce(v.id, g.id) AS id, v.v_score, g.g_score,
        |  CASE WHEN v.id IS NOT NULL AND g.id IS NOT NULL THEN 'both'
        |       WHEN v.id IS NOT NULL THEN 'vector' ELSE 'graph' END AS source
        |  FROM v FULL OUTER JOIN g ON v.id = g.id)
        |SELECT id,
        |  round(CASE WHEN source = 'both' THEN greatest(v_score, g_score) * 1.1
        |        ELSE coalesce(v_score, g_score) END, 6) AS score, source
        |FROM m ORDER BY id""".stripMargin,
    "q_graph_topology" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS mem, l_partkey AS ent FROM lineitem),
        |es AS (SELECT ent, count(DISTINCT mem) AS mem_count,
        |       (count(DISTINCT mem) > 1)::INT::DOUBLE AS shared FROM e GROUP BY ent),
        |agg AS (SELECT e.mem, count(DISTINCT e.ent)::BIGINT AS degree, avg(es.shared) AS shared_ratio
        |        FROM e JOIN es ON e.ent = es.ent GROUP BY e.mem)
        |SELECT mem, degree, round(shared_ratio, 6) AS shared_ratio,
        |  round(0.6 * least(1.0, ln(1.0 + degree) / ln(11.0)) + 0.4 * shared_ratio, 6) AS topology_score
        |FROM agg ORDER BY mem""".stripMargin,
    "q_graph_reinforcement" ->
      // the operator's own grouped-join shape (no wide pair
      // materialization): attach created_at to the M-E edge list ONCE,
      // derive the deduped (parent, child) key set via GROUP BY, and
      // join child importance back for the avg. The former
      // DISTINCT-pairs-with-two-m-joins formulation planned
      // pathologically in DuckDB at sf0.1 (>20 min); this one is
      // sub-second there, so A6 is verified at bench scale too.
      """WITH e AS (SELECT DISTINCT l_orderkey AS mem, l_partkey AS ent FROM lineitem),
        |m AS (SELECT o_orderkey AS mem, epoch_ms(o_orderdate) AS created_at,
        |      CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |           ELSE (o_orderkey % 97)::DOUBLE / 128.0 END AS importance
        |      FROM orders),
        |el AS (SELECT e.mem, e.ent, m.created_at FROM e JOIN m ON e.mem = m.mem),
        |pc AS (SELECT l.mem AS parent, r.mem AS child
        |       FROM el l JOIN el r ON l.ent = r.ent
        |       WHERE r.mem <> l.mem AND r.created_at > l.created_at
        |       GROUP BY 1, 2),
        |agg AS (SELECT pc.parent AS mem, avg(coalesce(cm.importance, 1.0)) AS avg_child_importance
        |        FROM pc JOIN m cm ON pc.child = cm.mem GROUP BY 1)
        |SELECT mem, avg_child_importance,
        |  greatest(0.0, least(1.0, 0.3 * avg_child_importance)) AS reinforcement
        |FROM agg ORDER BY mem""".stripMargin,
    "q_score_boost" ->
      """WITH e AS (SELECT DISTINCT l_orderkey AS mem, l_partkey AS ent FROM lineitem),
        |es AS (SELECT ent, (count(DISTINCT mem) > 1)::INT::DOUBLE AS shared FROM e GROUP BY ent),
        |topo AS (SELECT e.mem, 0.6 * least(1.0, ln(1.0 + count(DISTINCT e.ent)) / ln(11.0))
        |       + 0.4 * avg(es.shared) AS topology_score
        |       FROM e JOIN es ON e.ent = es.ent GROUP BY e.mem)
        |SELECT o.o_orderkey,
        |  round((o.o_totalprice / 500000.0) * (1.0 + 0.2 * coalesce(t.topology_score, 0.0)), 6) AS boosted
        |FROM orders o LEFT JOIN topo t ON o.o_orderkey = t.mem
        |ORDER BY o.o_orderkey""".stripMargin,
    "q_score_composite" ->
      """WITH f AS (SELECT l_orderkey AS o_orderkey, count(*)::BIGINT AS access_count
        |           FROM lineitem GROUP BY l_orderkey),
        |b AS (SELECT o.o_orderkey, o.o_totalprice, epoch_ms(o.o_orderdate) AS created_ms,
        |      coalesce(f.access_count, 0) AS access_count
        |      FROM orders o LEFT JOIN f ON o.o_orderkey = f.o_orderkey)
        |SELECT o_orderkey,
        |  round(0.4 * (o_totalprice / 600000.0)
        |      + 0.3 * exp(-0.01 * ((1767225600000 - created_ms) / 86400000.0))
        |      + 0.15 * least(1.0, ln(1.0 + access_count) / ln(101.0))
        |      + 0.15 * coalesce(CASE WHEN o_orderkey % 3 = 0 THEN NULL
        |                        ELSE o_totalprice / 600000.0 END, 1.0)
        |      + 0.0 * 0.0, 6) AS score
        |FROM b ORDER BY o_orderkey""".stripMargin
  )
}
