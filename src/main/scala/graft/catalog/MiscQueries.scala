package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import Tables._

/** Remaining small-operator coverage: point/property lookups (S2/S3),
  * relations-per-result decoration (J6), metadata JSON decode (F9),
  * relation aggregation strings (A7).
  */
object MiscQueries {

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_point_lookup" -> { (s, dir) =>
      // S2 — id-set point lookup as a broadcast join, never row-at-a-time
      import s.implicits._
      val ids = Seq(5L, 10L, 15L, 25L).toDF("c_custkey")
      load(s, dir, "customer").join(broadcast(ids), Seq("c_custkey"))
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
        .orderBy(col("c_custkey"))
    },
    "q_property_lookup" -> { (s, dir) =>
      // S3 — find_nodes_by_property(name, value)
      load(s, dir, "part").filter(col("p_size") === 10)
        .select(col("p_partkey"), col("p_name"), col("p_size"))
        .orderBy(col("p_partkey"))
    },
    "q_relations_decorate" -> { (s, dir) =>
      // J6 — per-memory relation decoration: (m)-[:HAS_ENTITY]->(e)
      // -[r]->(t) collected as a sorted joined string per memory
      // (order = memory, entity = part, relation = supplied_by supplier)
      val li = load(s, dir, "lineitem").filter(col("l_orderkey") < 500)
      val he = li.select(col("l_orderkey").as("mem"), col("l_partkey").as("ent")).distinct()
      val rel = load(s, dir, "lineitem")
        .select(col("l_partkey").as("ent"), col("l_suppkey").as("tgt")).distinct()
      he.join(rel, Seq("ent"))
        .select(col("mem"),
          concat(col("ent"), lit(":supplied_by:"), col("tgt")).as("r"))
        .groupBy(col("mem"))
        .agg(array_join(array_sort(collect_set(col("r"))), ";").as("relations"),
          countDistinct(col("r")).as("n_relations"))
        .orderBy(col("mem"))
    },
    "q_metadata_json" -> { (s, dir) =>
      // F9 — metadata JSON string decode (from_json to a map, like the
      // reference's json.loads at search/vector.py:422-433)
      load(s, dir, "events")
        .select(col("event_id"),
          from_json(col("props"),
            org.apache.spark.sql.types.DataTypes.createMapType(
              org.apache.spark.sql.types.DataTypes.StringType,
              org.apache.spark.sql.types.DataTypes.StringType))("k")
            .cast("long").as("k"))
        .filter(col("k") > 50)
        .orderBy(col("event_id"))
    },
    "q_zorder_layout" -> { (s, dir) =>
      // Z-order (Morton) layout index over two lineitem keys: 16-bit
      // grid normalization + bit-interleave + 64 z-range buckets, each
      // reporting the min/max column stats a pushed-down scan prunes
      // with. Pure integer shift/mask/div arithmetic — the oracle
      // replays every bit.
      graft.ops.LayoutOps.zorderStats(load(s, dir, "lineitem"),
          "l_partkey", "l_suppkey", buckets = 64)
    },
    "q_salted_join" -> { (s, dir) =>
      // skew-salted shuffle join: MG-sketch detection flags every
      // suppkey (uniform ~1% each > phi 0.5%), so the whole join runs
      // through the salted (key, salt) path — and must still be
      // row-identical to the plain join the oracle runs
      val li = load(s, dir, "lineitem")
      val sup = load(s, dir, "supplier")
        .withColumnRenamed("s_suppkey", "l_suppkey")
      graft.ops.SkewOps.saltedJoin(li, sup, "l_suppkey",
          saltFactor = 8, phi = 0.005)
        .groupBy(col("s_nationkey").cast("long").as("nationkey"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("nationkey"))
    },
    "q_funnel" -> { (s, dir) =>
      // ordered view→click→purchase funnel: step i counts only when
      // first reached strictly after step i−1's first reach; one
      // user-keyed shuffle reused by the co-partitioned step joins
      graft.ops.FunnelOps.funnel(load(s, dir, "events"),
        "user_id", "event_type", "ts", Seq("view", "click", "purchase"))
    },
    "q_retention" -> { (s, dir) =>
      // weekly signup-cohort retention (floor(epoch/604800) weeks —
      // integer arithmetic both engines replay exactly)
      graft.ops.FunnelOps.retention(load(s, dir, "events"),
        "user_id", "event_type", "ts", cohortType = "signup")
    },
    "q_transitions" -> { (s, dir) =>
      // event-transition matrix: one user-keyed lead window (event_id
      // breaks ts ties deterministically) + a |types|²-bounded count
      graft.ops.FunnelOps.transitions(load(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id")
    },
    "q_top_paths" -> { (s, dir) =>
      // first-3-event path census, top 20 (count desc, path asc);
      // per-user collect bounded by pathLen, never the event list
      graft.ops.FunnelOps.topPaths(load(s, dir, "events"),
        "user_id", "event_type", "ts", "event_id", pathLen = 3, topK = 20)
    },
    "q_interval_join" -> { (s, dir) =>
      // interval×interval overlap join (shipments in flight together
      // per supplier): interval = [shipdate_day, +quantity days]; the
      // bin width is DERIVED (p50 length) — the join emits each pair
      // once via the overlap-start-bin rule, no distinct pass
      val days = datediff(col("l_shipdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long")
      val iv = load(s, dir, "lineitem")
        .filter(year(col("l_shipdate")) === 1996)
        .select(col("l_suppkey").as("k"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("iid"),
          days.as("s"), (days + col("l_quantity").cast("int")).as("e"))
      val left = iv.select(col("k"), col("iid").as("a_id"),
        col("s").as("a_s"), col("e").as("a_e"))
      val right = iv.select(col("k"), col("iid").as("b_id"),
        col("s").as("b_s"), col("e").as("b_e"))
      graft.ops.AsofOps.intervalJoin(left, right, "k",
          "a_s", "a_e", "b_s", "b_e")
        .filter(col("a_id") < col("b_id"))
        .groupBy(col("k").as("suppkey"))
        .agg(count(lit(1)).as("n_pairs"),
          round(avg(least(col("a_e"), col("b_e")) -
            greatest(col("a_s"), col("b_s")) + 1), 6).as("avg_overlap_days"))
        .orderBy(col("suppkey"))
    },
    "q_band_join" -> { (s, dir) =>
      // epsilon band join (near-equal line-item prices per supplier):
      // one (key, bucket) equi-join with 3x fan-out on one side only —
      // never a per-key cartesian; symmetric self-join halved by id
      val li = load(s, dir, "lineitem")
        .select(col("l_suppkey").as("k"),
          (col("l_orderkey") * 10 + col("l_linenumber")).as("iid"),
          col("l_extendedprice").as("v"))
      val left = li.select(col("k"), col("iid").as("a_id"),
        col("v").as("a_v"))
      val right = li.select(col("k"), col("iid").as("b_id"),
        col("v").as("b_v"))
      graft.ops.AsofOps.bandJoin(left, right, "k", "a_v", "b_v", eps = 1.0)
        .filter(col("a_id") < col("b_id"))
        .select(col("k").as("suppkey"), col("a_id"), col("b_id"),
          col("a_v"), col("b_v"))
        .orderBy(col("suppkey"), col("a_id"), col("b_id"))
    },
    "q_pivot" -> { (s, dir) =>
      // wide-format per-user event-type counts: an EXPLICIT value list
      // (the deterministic-schema contract — value discovery would make
      // the output schema data-dependent), one groupBy-pivot agg
      val types = Seq("click", "error", "purchase", "signup", "view")
      val p = load(s, dir, "events")
        .groupBy(col("user_id"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
      p.select(col("user_id") +:
          types.map(t => coalesce(col(t), lit(0L)).as(s"n_$t")): _*)
        .orderBy(col("user_id"))
    },
    "q_rollup" -> { (s, dir) =>
      // hierarchical subtotals (year > priority > grand total) with
      // explicit grouping flags so subtotal NULLs are unambiguous;
      // integer-only aggregates keep the compare float-free
      load(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .withColumn("priority", col("o_orderpriority"))
        .rollup(col("o_year"), col("priority"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          grouping(col("o_year")).cast("long").as("gy"),
          grouping(col("priority")).cast("long").as("gp"))
        .select(col("o_year"), col("priority"), col("n"), col("n_cust"),
          col("gy"), col("gp"))
        .orderBy(col("gy"), col("gp"), col("o_year").asc_nulls_first,
          col("priority").asc_nulls_first)
    },
    "q_cube" -> { (s, dir) =>
      // the cube face of q_rollup: all four grouping sets (year ×
      // priority, year, priority, grand total) — same grouping-flag and
      // NULLS FIRST discipline, integer-only aggregates
      load(s, dir, "orders")
        .withColumn("o_year", year(col("o_orderdate")).cast("long"))
        .withColumn("priority", col("o_orderpriority"))
        .cube(col("o_year"), col("priority"))
        .agg(count(lit(1)).as("n"),
          countDistinct(col("o_custkey")).as("n_cust"),
          grouping(col("o_year")).cast("long").as("gy"),
          grouping(col("priority")).cast("long").as("gp"))
        .select(col("o_year"), col("priority"), col("n"), col("n_cust"),
          col("gy"), col("gp"))
        .orderBy(col("gy"), col("gp"), col("o_year").asc_nulls_first,
          col("priority").asc_nulls_first)
    },
    "q_bucketed_join" -> { (s, dir) =>
      // pay the fact-table shuffle ONCE at write: both sides bucketed
      // on the join key, then the join itself is exchange-free (the
      // shuffle-free property is asserted in SourcesSpec; this gate
      // checks the bucketed path returns the same rows as a plain join)
      import graft.sources.BucketedTables
      val base = java.nio.file.Files
        .createTempDirectory("graft_bucketed").toString
      BucketedTables.writeBucketed(load(s, dir, "lineitem"),
        "graft_bj_lineitem", s"$base/li", Seq("l_orderkey"), numBuckets = 8)
      BucketedTables.writeBucketed(
        load(s, dir, "orders").withColumnRenamed("o_orderkey", "l_orderkey"),
        "graft_bj_orders", s"$base/ord", Seq("l_orderkey"), numBuckets = 8)
      BucketedTables.colocatedJoin(s, "graft_bj_lineitem",
          "graft_bj_orders", Seq("l_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_items"),
          sum(col("l_quantity")).cast("long").as("sum_qty"))
        .orderBy(col("o_orderpriority"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_point_lookup" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE c_custkey IN (5, 10, 15, 25) ORDER BY c_custkey""".stripMargin,
    "q_property_lookup" ->
      """SELECT p_partkey, p_name, p_size FROM part
        |WHERE p_size = 10 ORDER BY p_partkey""".stripMargin,
    "q_relations_decorate" ->
      """WITH he AS (SELECT DISTINCT l_orderkey AS mem, l_partkey AS ent
        |            FROM lineitem WHERE l_orderkey < 500),
        |rel AS (SELECT DISTINCT l_partkey AS ent, l_suppkey AS tgt FROM lineitem),
        |rs AS (SELECT he.mem, he.ent || ':supplied_by:' || rel.tgt AS r
        |       FROM he JOIN rel ON he.ent = rel.ent)
        |SELECT mem, array_to_string(list_sort(list(DISTINCT r)), ';') AS relations,
        |  count(DISTINCT r)::BIGINT AS n_relations
        |FROM rs GROUP BY mem ORDER BY mem""".stripMargin,
    "q_metadata_json" ->
      """SELECT event_id, regexp_extract(props, '"k":\s*(\d+)', 1)::BIGINT AS k
        |FROM events WHERE regexp_extract(props, '"k":\s*(\d+)', 1)::BIGINT > 50
        |ORDER BY event_id""".stripMargin,
    // bit-exact replay of LayoutOps: same grid normalization (integer
    // // division), same magic-mask Morton spread, same z-range cut
    "q_zorder_layout" ->
      s"""WITH b AS (SELECT min(l_partkey)::BIGINT AS xlo,
         |    max(l_partkey)::BIGINT AS xhi,
         |    min(l_suppkey)::BIGINT AS ylo,
         |    max(l_suppkey)::BIGINT AS yhi FROM lineitem),
         |n AS (SELECT l.l_partkey, l.l_suppkey,
         |  ((l.l_partkey::BIGINT - b.xlo) * 65535) // greatest(1, b.xhi - b.xlo) AS nx,
         |  ((l.l_suppkey::BIGINT - b.ylo) * 65535) // greatest(1, b.yhi - b.ylo) AS ny
         |  FROM lineitem l, b),
         |z AS (SELECT l_partkey, l_suppkey,
         |  (${sqlSpread16("nx")} | (${sqlSpread16("ny")} << 1)) AS zv FROM n)
         |SELECT (zv * 64) // 4294967296 AS bucket, count(*)::BIGINT AS n,
         |  min(l_partkey)::BIGINT AS min1, max(l_partkey)::BIGINT AS max1,
         |  min(l_suppkey)::BIGINT AS min2, max(l_suppkey)::BIGINT AS max2
         |FROM z GROUP BY 1 ORDER BY bucket""".stripMargin,
    // mirror of FunnelOps.funnel: correlated first-reach mins
    "q_funnel" ->
      """WITH u1 AS (SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |u2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
        |  JOIN u1 USING (user_id)
        |  WHERE e.event_type = 'click' AND e.ts > u1.t1 GROUP BY 1),
        |u3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
        |  JOIN u2 USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ts > u2.t2 GROUP BY 1),
        |n AS (SELECT (SELECT count(*) FROM u1)::BIGINT AS n1,
        |  (SELECT count(*) FROM u2)::BIGINT AS n2,
        |  (SELECT count(*) FROM u3)::BIGINT AS n3)
        |SELECT 1::BIGINT AS step, 'view' AS step_name, n1 AS n_users,
        |  round(n1::DOUBLE / n1, 6) AS conversion FROM n
        |UNION ALL SELECT 2::BIGINT, 'click', n2, round(n2::DOUBLE / n1, 6) FROM n
        |UNION ALL SELECT 3::BIGINT, 'purchase', n3, round(n3::DOUBLE / n1, 6) FROM n
        |ORDER BY step""".stripMargin,
    // mirror of FunnelOps.retention: same integer week arithmetic
    "q_retention" ->
      """WITH e AS (SELECT user_id, event_type,
        |    floor(epoch(ts))::BIGINT // 604800 AS wk FROM events),
        |c AS (SELECT user_id, min(wk) AS cw FROM e
        |  WHERE event_type = 'signup' GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, wk FROM e),
        |sz AS (SELECT cw, count(*) AS cohort_size FROM c GROUP BY 1),
        |r AS (SELECT c.cw, a.wk - c.cw AS week_offset,
        |    count(*) AS n_active
        |  FROM a JOIN c USING (user_id) WHERE a.wk >= c.cw GROUP BY 1, 2)
        |SELECT r.cw AS cohort_week, r.week_offset, r.n_active,
        |  sz.cohort_size,
        |  round(r.n_active::DOUBLE / sz.cohort_size, 6) AS retention
        |FROM r JOIN sz USING (cw)
        |ORDER BY cohort_week, week_offset""".stripMargin,
    // mirror of FunnelOps.transitions: same lead window + tie-break
    "q_transitions" ->
      """WITH s AS (SELECT user_id, event_type,
        |    lead(event_type) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS nxt FROM events),
        |c AS (SELECT event_type AS from_type, nxt AS to_type,
        |    count(*)::BIGINT AS n_transitions
        |  FROM s WHERE nxt IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n_transitions,
        |  round(n_transitions::DOUBLE /
        |    (sum(n_transitions) OVER (PARTITION BY from_type))::DOUBLE, 6)
        |    AS share
        |FROM c ORDER BY from_type, to_type""".stripMargin,
    // mirror of FunnelOps.topPaths: ordered string_agg over rn<=3
    "q_top_paths" ->
      """WITH r AS (SELECT user_id, event_type,
        |    row_number() OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id) AS rn FROM events),
        |p AS (SELECT user_id, string_agg(event_type, '>' ORDER BY rn)
        |    AS path FROM r WHERE rn <= 3 GROUP BY 1)
        |SELECT path, count(*)::BIGINT AS n_users FROM p GROUP BY 1
        |ORDER BY n_users DESC, path ASC LIMIT 20""".stripMargin,
    // mirror of the interval overlap join: plain inequality self-join
    "q_interval_join" ->
      """WITH iv AS (SELECT l_suppkey AS k,
        |    l_orderkey * 10 + l_linenumber AS iid,
        |    (l_shipdate::DATE - DATE '1970-01-01')::BIGINT AS s,
        |    (l_shipdate::DATE - DATE '1970-01-01')::BIGINT
        |      + l_quantity::INT AS e
        |  FROM lineitem WHERE year(l_shipdate) = 1996)
        |SELECT a.k AS suppkey, count(*)::BIGINT AS n_pairs,
        |  round(avg(least(a.e, b.e) - greatest(a.s, b.s) + 1), 6)
        |    AS avg_overlap_days
        |FROM iv a JOIN iv b ON a.k = b.k AND a.iid < b.iid
        |  AND a.s <= b.e AND b.s <= a.e
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // mirror of the band join: plain inequality self-join
    "q_band_join" ->
      """WITH x AS (SELECT l_suppkey AS k,
        |    l_orderkey * 10 + l_linenumber AS iid,
        |    l_extendedprice AS v FROM lineitem)
        |SELECT a.k AS suppkey, a.iid AS a_id, b.iid AS b_id,
        |  a.v AS a_v, b.v AS b_v
        |FROM x a JOIN x b ON a.k = b.k AND a.iid < b.iid
        |  AND abs(a.v - b.v) <= 1.0
        |ORDER BY suppkey, a_id, b_id""".stripMargin,
    // mirror of the pivot: conditional aggregation (the portable form)
    "q_pivot" ->
      """SELECT user_id,
        |  count(*) FILTER (WHERE event_type = 'click')::BIGINT AS n_click,
        |  count(*) FILTER (WHERE event_type = 'error')::BIGINT AS n_error,
        |  count(*) FILTER (WHERE event_type = 'purchase')::BIGINT
        |    AS n_purchase,
        |  count(*) FILTER (WHERE event_type = 'signup')::BIGINT
        |    AS n_signup,
        |  count(*) FILTER (WHERE event_type = 'view')::BIGINT AS n_view
        |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    // mirror of the rollup: GROUPING flags disambiguate subtotal NULLs
    "q_rollup" ->
      """WITH o AS (SELECT year(o_orderdate)::BIGINT AS o_year,
        |    o_orderpriority AS priority, o_custkey FROM orders)
        |SELECT o_year, priority, count(*)::BIGINT AS n,
        |  count(DISTINCT o_custkey)::BIGINT AS n_cust,
        |  grouping(o_year)::BIGINT AS gy,
        |  grouping(priority)::BIGINT AS gp
        |FROM o GROUP BY ROLLUP (o_year, priority)
        |ORDER BY gy, gp, o_year NULLS FIRST, priority NULLS FIRST"""
        .stripMargin,
    // mirror of the cube: GROUP BY CUBE with the same flag columns
    "q_cube" ->
      """WITH o AS (SELECT year(o_orderdate)::BIGINT AS o_year,
        |    o_orderpriority AS priority, o_custkey FROM orders)
        |SELECT o_year, priority, count(*)::BIGINT AS n,
        |  count(DISTINCT o_custkey)::BIGINT AS n_cust,
        |  grouping(o_year)::BIGINT AS gy,
        |  grouping(priority)::BIGINT AS gp
        |FROM o GROUP BY CUBE (o_year, priority)
        |ORDER BY gy, gp, o_year NULLS FIRST, priority NULLS FIRST"""
        .stripMargin,
    // the bucketed co-located join must return the plain join's rows
    "q_bucketed_join" ->
      """SELECT o.o_orderpriority, count(*)::BIGINT AS n_items,
        |  sum(l.l_quantity)::BIGINT AS sum_qty
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1 ORDER BY o.o_orderpriority""".stripMargin,
    // the salted join must be row-multiset-identical to the plain join
    "q_salted_join" ->
      """SELECT s.s_nationkey::BIGINT AS nationkey,
        |  count(*)::BIGINT AS n_items,
        |  sum(l.l_quantity)::BIGINT AS sum_qty
        |FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
        |GROUP BY 1 ORDER BY nationkey""".stripMargin
  )

  /** DuckDB mirror of LayoutOps.spread16 — the magic-mask Morton
    * cascade as a SQL expression over a (small) named input expr.
    */
  private def sqlSpread16(e: String): String = {
    val a = s"((($e) | (($e) << 8)) & 16711935)"
    val b = s"(($a | ($a << 4)) & 252645135)"
    val c = s"(($b | ($b << 2)) & 858993459)"
    s"(($c | ($c << 1)) & 1431655765)"
  }
}
