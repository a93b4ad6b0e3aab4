package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.{FilterOps, GraphOps}
import Tables._

/** Filter / predicate / windowed-aggregation queries over the `events`
  * table (F1-F7, J11/A9, A3, A4, S11/A2; SURVEY §2.2, §2.5).
  *
  * `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some testdata
  * generations and TIMESTAMP(MICROS) in others, so the loader adapts to
  * the read schema: NANOS arrives as a nanos Long (under
  * spark.sql.legacy.parquet.nanosAsLong) and floors to epoch-ms by
  * integer division; MICROS arrives as TIMESTAMP_NTZ and converts via
  * unix_millis in the UTC session zone. Both equal DuckDB's
  * epoch_ms(ts) (all three floor).
  */
object FilterQueries {

  private def events(s: SparkSession, dir: String): DataFrame = {
    val raw = load(s, dir, "events")
    val ms = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case _ => unix_millis(col("ts").cast("timestamp"))
    }
    raw.withColumn("ms", ms).drop("ts")
  }

  // fixed window inside the events time range (2024-01-01 + ~35 days)
  private val T0 = 1704067200000L // 2024-01-01T00:00:00Z
  private val T1 = T0 + 14L * 86400000L
  private val Pit = T0 + 7L * 86400000L

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_filter_scope" -> { (s, dir) =>
      // F1 — conjunctive equality scope filter from string config
      val ev = events(s, dir).withColumn("user_str", col("user_id").cast("string"))
      ev.filter(FilterOps.scopeFilter(Map("event_type" -> "view", "user_str" -> "7")))
        .select(col("event_id"), col("ms"))
        .orderBy(col("event_id"))
    },
    "q_filter_predicates" -> { (s, dir) =>
      // F2 — operator predicates with Python null semantics ($ne passes
      // NULL); event_type nulled for clicks to exercise them
      import FilterOps._
      val ev = events(s, dir).withColumn(
        "etype_n",
        when(col("event_type") === "click", lit(null: String)).otherwise(col("event_type"))
      )
      ev.filter(
          predicatesFor(ev, Map(
            "value" -> Gt(10.0),
            "etype_n" -> Ne("view"),
            "props" -> Contains("6")
          )))
        .select(col("event_id"), col("etype_n"), col("value"))
        .orderBy(col("event_id"))
    },
    "q_filter_timerange" -> { (s, dir) =>
      // F4 — created_at range filter
      val ev = events(s, dir)
      ev.filter(FilterOps.timeRange(col("ms"), Some(T0), Some(T1)))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 6).as("sum_value"))
        .orderBy(col("event_type"))
    },
    "q_filter_pit" -> { (s, dir) =>
      // F5 — bitemporal point-in-time: valid_at = ts, invalid_at only for
      // views (valid for `value` days), NULL valid_at for errors (the
      // reference's permissive NULL-passes rule, manager.py:2031-2040)
      val ev = events(s, dir)
        .withColumn(
          "valid_at",
          when(col("event_type") === "error", lit(null: java.lang.Long)).otherwise(col("ms"))
        )
        .withColumn(
          "invalid_at",
          when(col("event_type") === "view", col("ms") + floor(col("value") * 86400000.0))
            .otherwise(lit(null: java.lang.Long))
        )
      ev.filter(FilterOps.validAtPointInTime(col("valid_at"), col("invalid_at"), Pit))
        .select(col("event_id"), col("valid_at"), col("invalid_at"))
        .orderBy(col("event_id"))
    },
    "q_filter_memtype" -> { (s, dir) =>
      // F3+F7 — soft-expiry filter + memory-type with missing→"semantic";
      // clicks have NULL type (→"semantic") and errors are "expired"
      val ev = events(s, dir)
        .withColumn(
          "mtype",
          when(col("event_type") === "click", lit(null: String)).otherwise(col("event_type"))
        )
        .withColumn(
          "expired_at",
          when(col("event_type") === "error", col("ms")).otherwise(lit(null: java.lang.Long))
        )
      ev.filter(FilterOps.notExpired(col("expired_at")))
        .filter(FilterOps.memoryType(col("mtype"), "semantic"))
        .select(col("event_id"))
        .orderBy(col("event_id"))
    },
    "q_latest_per_key" -> { (s, dir) =>
      // J11/A9 — as-of top-1 per key: latest event per user at Pit
      val ev = events(s, dir)
      GraphOps.latestPerKey(ev, Seq("user_id"), "ms", "event_id", asOf = Some(Pit))
        .select(col("user_id"), col("event_id"), col("ms"))
        .orderBy(col("user_id"))
    },
    "q_asof_join" -> { (s, dir) =>
      // as-of join: every view picks up the latest prior click of the
      // same user (ties on ms match; right side pre-reduced to one row
      // per (user, ms) per the op contract). The oracle runs DuckDB's
      // NATIVE ASOF JOIN — hash-matching it proves the union+window
      // dataflow implements the same semantics without any join.
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ms"))
        .agg(max(col("event_id")).as("click_id"))
        .withColumn("click_ms", col("ms"))
      graft.ops.AsofOps
        .asofJoin(views, clicks, "user_id", "ms", Seq("click_id", "click_ms"))
        .withColumn("lag_ms", col("ms") - col("click_ms"))
        .select(col("event_id"), col("user_id"), col("ms"),
          col("click_id"), col("click_ms"), col("lag_ms"))
        .orderBy(col("event_id"))
    },
    "q_asof_tolerance" -> { (s, dir) =>
      // as-of with a 1 h tolerance (merge_asof semantics): a view whose
      // latest prior click is older than an hour matches nothing — the
      // payload nulls out, no fallback (any earlier click is farther)
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ms"))
        .agg(max(col("event_id")).as("click_id"))
        .withColumn("click_ms", col("ms"))
      graft.ops.AsofOps
        .asofJoin(views, clicks, "user_id", "ms", Seq("click_id", "click_ms"),
          toleranceMs = 3600000L)
        .select(col("event_id"), col("user_id"), col("ms"),
          col("click_id"), col("click_ms"))
        .orderBy(col("event_id"))
    },
    "q_asof_nearest" -> { (s, dir) =>
      // nearest-direction as-of (merge_asof direction='nearest'): each
      // view matches the CLOSER of its latest-prior / earliest-later
      // click, backward winning exact-distance ties; same one-shuffle
      // union+window dataflow (the forward pass is a second frame on
      // the same sort)
      val ev = events(s, dir)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id"), col("ms"))
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ms"))
        .agg(max(col("event_id")).as("click_id"))
        .withColumn("click_ms", col("ms"))
      graft.ops.AsofOps
        .asofJoin(views, clicks, "user_id", "ms", Seq("click_id", "click_ms"),
          direction = "nearest")
        .select(col("event_id"), col("user_id"), col("ms"),
          col("click_id"), col("click_ms"))
        .orderBy(col("event_id"))
    },
    "q_range_join" -> { (s, dir) =>
      // range join: views falling inside each error's 6 h aftermath
      // window, per user — bin-bucketed equi-join (bin = interval
      // length), aggregated to a per-error count with zero-match
      // errors retained
      val ev = events(s, dir)
      val errors = ev.filter(col("event_type") === "error")
        .select(col("user_id"), col("event_id").as("error_id"),
          col("ms").as("start_ms"))
        .withColumn("end_ms", col("start_ms") + 6L * 3600000L)
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("event_id").as("view_id"),
          col("ms").as("view_ms"))
      val pairs = graft.ops.AsofOps.rangeJoin(
        views, errors, "user_id", "view_ms", "start_ms", "end_ms",
        binMs = 6L * 3600000L)
      errors
        .join(pairs.groupBy(col("error_id")).agg(count(lit(1)).as("n_views")),
          Seq("error_id"), "left")
        .select(col("error_id"), col("user_id"), col("start_ms"),
          coalesce(col("n_views"), lit(0L)).as("n_views"))
        .orderBy(col("error_id"))
    },
    "q_sessionize" -> { (s, dir) =>
      // gap-based sessionization (batch face of the streaming
      // sessionizer): 6 h boundary over each user's event stream —
      // chosen from the corpus gap distribution (median inter-event gap
      // ≈7.7 h), so real multi-event sessions AND boundaries both occur
      val ev = events(s, dir)
      graft.ops.SessionOps
        .sessionSummaries(ev, "user_id", "ms", "event_id", gapMs = 6L * 3600000L)
        .select(col("user_id"), col("session_idx"),
          col("n_events"), col("start_ts").as("start_ms"),
          col("end_ts").as("end_ms"), col("duration_ms"))
        .orderBy(col("user_id"), col("session_idx"))
    },
    "q_rolling_window" -> { (s, dir) =>
      // trailing 7-day per-user activity features: RANGE-frame window,
      // tie-symmetric so no id tie-break is needed for determinism
      graft.ops.FunnelOps.rollingFeatures(events(s, dir),
          "user_id", "ms", "value", "event_id",
          windowMs = 7L * 86400000L)
        .orderBy(col("event_id"))
    },
    "q_group_by_session" -> { (s, dir) =>
      // A3 — group-by-session with chronological order inside each group
      // (ids joined to a string so the compare is array-free)
      val ev = events(s, dir)
      ev.groupBy(col("user_id"))
        .agg(
          array_join(
            transform(
              sort_array(collect_list(struct(col("ms"), col("event_id")))),
              x => x.getField("event_id").cast("string")
            ),
            ","
          ).as("event_ids"),
          count(lit(1)).as("n")
        )
        .orderBy(col("user_id"))
    },
    "q_dedup_by_id" -> { (s, dir) =>
      // A4 — ordered dedup: keep the highest-value event per type
      val ev = events(s, dir)
      val w = Window.partitionBy(col("event_type"))
        .orderBy(col("value").desc, col("event_id").asc)
      ev.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("event_type"), col("event_id"), col("value"))
        .orderBy(col("event_type"))
    },
    "q_stats" -> { (s, dir) =>
      // S11/A2 — stats scan: counts by type + distinct users
      val ev = events(s, dir)
      ev.groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("user_id")).as("n_users"),
          round(avg(col("value")), 6).as("avg_value")
        )
        .orderBy(col("event_type"))
    }
  )

  def oracle: Map[String, String] = Map(
    "q_filter_scope" ->
      s"""SELECT event_id, epoch_ms(ts) AS ms FROM events
         |WHERE event_type = 'view' AND user_id::VARCHAR = '7'
         |ORDER BY event_id""".stripMargin,
    "q_filter_predicates" ->
      s"""WITH ev AS (SELECT event_id, value, props,
         |  CASE WHEN event_type = 'click' THEN NULL ELSE event_type END AS etype_n FROM events)
         |SELECT event_id, etype_n, value FROM ev
         |WHERE value > 10.0 AND (etype_n IS NULL OR etype_n <> 'view')
         |  AND (props IS NOT NULL AND contains(props, '6'))
         |ORDER BY event_id""".stripMargin,
    "q_filter_timerange" ->
      s"""SELECT event_type, count(*)::BIGINT AS n, round(sum(value), 6) AS sum_value
         |FROM events WHERE epoch_ms(ts) >= $T0 AND epoch_ms(ts) <= $T1
         |GROUP BY event_type ORDER BY event_type""".stripMargin,
    "q_filter_pit" ->
      s"""WITH ev AS (SELECT event_id,
         |  CASE WHEN event_type = 'error' THEN NULL ELSE epoch_ms(ts) END AS valid_at,
         |  CASE WHEN event_type = 'view' THEN epoch_ms(ts) + floor(value * 86400000.0)::BIGINT
         |       ELSE NULL END AS invalid_at
         |  FROM events)
         |SELECT event_id, valid_at, invalid_at FROM ev
         |WHERE valid_at IS NULL OR (valid_at <= $Pit AND (invalid_at IS NULL OR invalid_at > $Pit))
         |ORDER BY event_id""".stripMargin,
    "q_filter_memtype" ->
      s"""WITH ev AS (SELECT event_id,
         |  CASE WHEN event_type = 'click' THEN NULL ELSE event_type END AS mtype,
         |  CASE WHEN event_type = 'error' THEN epoch_ms(ts) ELSE NULL END AS expired_at
         |  FROM events)
         |SELECT event_id FROM ev
         |WHERE expired_at IS NULL AND coalesce(mtype, 'semantic') = 'semantic'
         |ORDER BY event_id""".stripMargin,
    "q_latest_per_key" ->
      s"""WITH b AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events
         |           WHERE epoch_ms(ts) <= $Pit),
         |r AS (SELECT user_id, event_id, ms,
         |      row_number() OVER (PARTITION BY user_id ORDER BY ms DESC, event_id DESC) AS rn
         |      FROM b)
         |SELECT user_id, event_id, ms FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,
    "q_asof_join" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
         |v AS (SELECT user_id, event_id, ms FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, ms AS cms, max(event_id) AS click_id
         |      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT v.event_id, v.user_id, v.ms, c.click_id,
         |  c.cms AS click_ms, v.ms - c.cms AS lag_ms
         |FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ms >= c.cms
         |ORDER BY v.event_id""".stripMargin,
    "q_asof_tolerance" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
         |v AS (SELECT user_id, event_id, ms FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, ms AS cms, max(event_id) AS click_id
         |      FROM e WHERE event_type = 'click' GROUP BY 1, 2)
         |SELECT v.event_id, v.user_id, v.ms,
         |  CASE WHEN v.ms - c.cms <= 3600000 THEN c.click_id END AS click_id,
         |  CASE WHEN v.ms - c.cms <= 3600000 THEN c.cms END AS click_ms
         |FROM v ASOF LEFT JOIN c ON v.user_id = c.user_id AND v.ms >= c.cms
         |ORDER BY v.event_id""".stripMargin,
    "q_asof_nearest" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
         |v AS (SELECT user_id, event_id, ms FROM e WHERE event_type = 'view'),
         |c AS (SELECT user_id, ms AS cms, max(event_id) AS click_id
         |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
         |b AS (SELECT v.event_id, v.user_id, v.ms, c.click_id AS b_id,
         |      c.cms AS b_ms
         |      FROM v ASOF LEFT JOIN c
         |        ON v.user_id = c.user_id AND v.ms >= c.cms),
         |f AS (SELECT v.event_id, c.click_id AS f_id, c.cms AS f_ms
         |      FROM v ASOF LEFT JOIN c
         |        ON v.user_id = c.user_id AND v.ms <= c.cms)
         |SELECT b.event_id, b.user_id, b.ms,
         |  CASE WHEN b.b_ms IS NOT NULL AND
         |    (f.f_ms IS NULL OR b.ms - b.b_ms <= f.f_ms - b.ms)
         |    THEN b.b_id ELSE f.f_id END AS click_id,
         |  CASE WHEN b.b_ms IS NOT NULL AND
         |    (f.f_ms IS NULL OR b.ms - b.b_ms <= f.f_ms - b.ms)
         |    THEN b.b_ms ELSE f.f_ms END AS click_ms
         |FROM b JOIN f USING (event_id) ORDER BY b.event_id""".stripMargin,
    "q_range_join" ->
      s"""WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, event_type FROM events),
         |er AS (SELECT user_id, event_id AS error_id, ms AS start_ms,
         |       ms + 21600000 AS end_ms FROM e WHERE event_type = 'error'),
         |v AS (SELECT user_id, ms FROM e WHERE event_type = 'view'),
         |p AS (SELECT er.error_id, count(*) AS n FROM er JOIN v
         |      ON er.user_id = v.user_id AND v.ms >= er.start_ms AND v.ms <= er.end_ms
         |      GROUP BY 1)
         |SELECT er.error_id, er.user_id, er.start_ms,
         |  coalesce(p.n, 0)::BIGINT AS n_views
         |FROM er LEFT JOIN p USING (error_id) ORDER BY er.error_id""".stripMargin,
    "q_sessionize" ->
      s"""WITH b AS (SELECT user_id, event_id, epoch_ms(ts) AS ms FROM events),
         |s AS (SELECT user_id, event_id, ms,
         |  CASE WHEN lag(ms) OVER w IS NULL OR ms - lag(ms) OVER w > 21600000
         |       THEN 1 ELSE 0 END AS st
         |  FROM b WINDOW w AS (PARTITION BY user_id ORDER BY ms, event_id)),
         |x AS (SELECT user_id, ms,
         |  sum(st) OVER (PARTITION BY user_id ORDER BY ms, event_id
         |    ROWS UNBOUNDED PRECEDING) - 1 AS session_idx FROM s)
         |SELECT user_id, session_idx::BIGINT AS session_idx,
         |  count(*)::BIGINT AS n_events, min(ms) AS start_ms, max(ms) AS end_ms,
         |  (max(ms) - min(ms))::BIGINT AS duration_ms
         |FROM x GROUP BY user_id, session_idx
         |ORDER BY user_id, session_idx""".stripMargin,
    // mirror of FunnelOps.rollingFeatures: same RANGE frame over ms
    "q_rolling_window" ->
      s"""WITH b AS (SELECT user_id, event_id, epoch_ms(ts) AS ms, value
         |  FROM events)
         |SELECT user_id, event_id, ms,
         |  count(*) OVER w AS n_window,
         |  round(sum(value) OVER w, 6) AS window_value
         |FROM b
         |WINDOW w AS (PARTITION BY user_id ORDER BY ms
         |  RANGE BETWEEN 604800000 PRECEDING AND CURRENT ROW)
         |ORDER BY event_id""".stripMargin,
    "q_group_by_session" ->
      s"""SELECT user_id,
         |  array_to_string(list(event_id::VARCHAR ORDER BY epoch_ms(ts), event_id), ',') AS event_ids,
         |  count(*)::BIGINT AS n
         |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin,
    "q_dedup_by_id" ->
      s"""WITH r AS (SELECT event_type, event_id, value,
         |  row_number() OVER (PARTITION BY event_type ORDER BY value DESC, event_id ASC) AS rn
         |  FROM events)
         |SELECT event_type, event_id, value FROM r WHERE rn = 1 ORDER BY event_type""".stripMargin,
    "q_stats" ->
      s"""SELECT event_type, count(*)::BIGINT AS n,
         |  count(DISTINCT user_id)::BIGINT AS n_users,
         |  round(avg(value), 6) AS avg_value
         |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin
  )
}
