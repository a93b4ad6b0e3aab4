package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classic event-stream product analytics over the events table:
  * sequential funnels and cohort retention — the two queries every
  * event warehouse runs daily, expressed with the engine's
  * one-shuffle-per-key discipline.
  */
object FunnelOps {

  /** Strictly-sequential funnel: for each user, step i counts only if
    * its FIRST occurrence lies strictly after the first qualifying
    * occurrence of step i−1 (the standard ordered-funnel semantics —
    * a purchase before the click does not convert).
    *
    * Scale shape: events filtered to the step types pay ONE user-keyed
    * shuffle; each subsequent step is a user-keyed join + min-agg over
    * that same partitioning (steps.length − 1 co-partitioned joins,
    * steps are a handful by contract). No per-user event collection —
    * per-user event counts never bound memory.
    *
    * Output: one row per step — (step 1-based, step_name, n_users,
    * conversion = n_users / step-1 users, rounded to 6).
    */
  def funnel(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step required")
    require(steps.distinct.size == steps.size, "steps must be distinct")
    val spark = events.sparkSession
    val p = spark.sessionState.conf.numShufflePartitions
    val ev = events
      .select(col(userCol).as("_u"), col(typeCol).as("_t"),
        col(tsCol).as("_ts"))
      .filter(col("_t").isin(steps: _*))
      .repartition(p, col("_u"))
      .localCheckpoint() // one user shuffle, reused by every step join
    val reachedPerStep = steps.tail.scanLeft(
      ev.filter(col("_t") === steps.head)
        .groupBy(col("_u")).agg(min(col("_ts")).as("_r"))) {
      case (prev, s) =>
        prev.join(ev.filter(col("_t") === s), Seq("_u"))
          .filter(col("_ts") > col("_r"))
          .groupBy(col("_u")).agg(min(col("_ts")).as("_r"))
    }
    val first = reachedPerStep.head.agg(count(lit(1)).as("_n1"))
    reachedPerStep.zipWithIndex.map { case (df, i) =>
      df.agg(count(lit(1)).as("n_users"))
        .select(lit((i + 1).toLong).as("step"),
          lit(steps(i)).as("step_name"), col("n_users"))
    }.reduce(_ unionByName _)
      .crossJoin(broadcast(first))
      .select(col("step"), col("step_name"), col("n_users"),
        round(col("n_users").cast("double") /
          col("_n1").cast("double"), 6).as("conversion"))
      .orderBy(col("step"))
  }

  /** Event-transition matrix: counts of consecutive (from_type →
    * to_type) pairs within each user's time-ordered stream, with a
    * unique id column breaking timestamp ties so the ordering (and
    * therefore the counts) is deterministic on any layout or engine.
    *
    * Scale shape: one user-keyed shuffle + per-user local sort (the
    * lag window), then a (from, to)-keyed count agg — map-side
    * combinable, and the result is |event types|² rows at most, so the
    * final exchange is tiny regardless of corpus size. No per-user
    * event collection.
    *
    * Output: (from_type, to_type, n_transitions, share round6 of the
    * from_type's outgoing total), ordered by (from_type, to_type).
    */
  def transitions(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    val counts = events
      .withColumn("_next", lead(col(typeCol), 1).over(w))
      .filter(col("_next").isNotNull)
      .groupBy(col(typeCol).as("from_type"), col("_next").as("to_type"))
      .agg(count(lit(1)).as("n_transitions"))
    val w2 = Window.partitionBy(col("from_type"))
    counts
      .select(col("from_type"), col("to_type"), col("n_transitions"),
        round(col("n_transitions").cast("double") /
          sum(col("n_transitions")).over(w2).cast("double"), 6).as("share"))
      .orderBy(col("from_type"), col("to_type"))
  }

  /** Top event paths: each user's first `pathLen` events (time order,
    * id tie-break) joined into a "a>b>c" path string, counted, top
    * `topK` paths by (count desc, path asc — deterministic).
    *
    * Scale shape: the user-keyed rank window shares the transitions
    * shuffle shape; the per-user collect is bounded by `pathLen`
    * (array_sort on ≤pathLen structs, never the full event list); the
    * path count agg is map-side combinable and TakeOrdered bounds the
    * result.
    */
  def topPaths(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      idCol: String,
      pathLen: Int,
      topK: Int): DataFrame = {
    require(pathLen >= 1 && topK >= 1, "pathLen and topK must be >= 1")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol).asc, col(idCol).asc)
    events
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= pathLen)
      .groupBy(col(userCol))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("_rn"), col(typeCol).as("_t")))),
        x => x.getField("_t")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path").asc)
      .limit(topK)
  }

  /** Rolling trailing-window features per event: for every event row,
    * the count of the user's events and the (round6) sum of their
    * `valueCol` within the trailing `windowMs` — the standard
    * activity-rate / velocity feature for abuse detection and
    * engagement scoring.
    *
    * The frame is a RANGE frame over the millisecond timestamp, so
    * timestamp ties are symmetric (every equal-ts row is in every
    * equal-ts row's frame) and the result is independent of tie order —
    * deterministic without an id tie-break, on any engine.
    *
    * Scale shape: one user-keyed shuffle + per-user local sort (the
    * shape shared with sessionize/transitions — pipelines reuse the
    * exchange); the running frame is computed in one pass per
    * partition, never a per-row rescan. A hot user is one partition's
    * sort, handled by AQE skew like every keyed window here.
    *
    * Output: one row per event — (userCol, idCol, tsMsCol, n_window,
    * window_value).
    */
  def rollingFeatures(
      events: DataFrame,
      userCol: String,
      tsMsCol: String,
      valueCol: String,
      idCol: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, "windowMs must be positive")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsMsCol).cast("long"))
      .rangeBetween(-windowMs, 0)
    events.select(col(userCol), col(idCol), col(tsMsCol),
      count(lit(1)).over(w).as("n_window"),
      round(sum(col(valueCol)).over(w), 6).as("window_value"))
  }

  /** Cohort retention: users are cohorted by the WEEK of their first
    * `cohortType` event; a cohort's week-k retention is the share of
    * its users with ANY event in cohort_week + k. Weeks are
    * floor(epoch_seconds / 604800) — engine-independent integer
    * arithmetic.
    *
    * Scale shape: one user-keyed min-agg (cohort assignment, broadcast
    * if users fit, else a plain user-keyed join), one distinct over
    * (user, week) — both map-side combinable — then a tiny
    * (cohort_week, offset) count. Nothing is per-event state.
    *
    * Output: (cohort_week, week_offset, n_active, cohort_size,
    * retention round6) for offsets ≥ 0, ordered.
    */
  def retention(
      events: DataFrame,
      userCol: String,
      typeCol: String,
      tsCol: String,
      cohortType: String): DataFrame = {
    val ev = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      col(tsCol).as("_tsx"))
      .withColumn("_wk", expr("CAST(unix_timestamp(_tsx) div 604800 AS BIGINT)"))
    val cohorts = ev.filter(col("_t") === cohortType)
      .groupBy(col("_u")).agg(min(col("_wk")).as("_cw"))
    val active = ev.select(col("_u"), col("_wk")).distinct()
    val sizes = cohorts.groupBy(col("_cw")).agg(count(lit(1)).as("cohort_size"))
    active.join(cohorts, Seq("_u"))
      .filter(col("_wk") >= col("_cw"))
      .groupBy(col("_cw"), (col("_wk") - col("_cw")).as("week_offset"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), Seq("_cw"))
      .select(col("_cw").as("cohort_week"), col("week_offset"),
        col("n_active"), col("cohort_size"),
        round(col("n_active").cast("double") /
          col("cohort_size").cast("double"), 6).as("retention"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }
}
