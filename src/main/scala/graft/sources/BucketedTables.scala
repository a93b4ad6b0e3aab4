package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table layout: pre-shuffle a table ONCE at write time so
  * every future equi-join / aggregation on the bucket key runs with no
  * exchange at all — the canonical way to amortize the biggest shuffle
  * of a 100-TB pipeline across every downstream query.
  *
  * Spark-native bucketing (not Hive's): `bucketBy` on the writer hashes
  * each row's key into `numBuckets` files per partition and records the
  * layout in the catalog; a scan of the table then reports a
  * HashPartitioning output partitioning, and joins/aggs keyed on the
  * bucket columns skip their ShuffleExchange entirely when both sides
  * agree on (key, numBuckets). `sortBy` additionally pre-sorts within
  * buckets so sort-merge joins skip their per-partition sort.
  *
  * At 100 TB: bucket the fact tables on their join key at ingest
  * (numBuckets ≈ cluster cores × a small factor, so one bucket fits an
  * executor's memory), and the day-to-day joins against them become
  * map-side — the exchange that would otherwise move the whole fact
  * table per query is paid once, at write.
  */
object BucketedTables {

  /** Write `df` as a bucketed external parquet table registered in the
    * session catalog (required — bucketing metadata lives in the
    * catalog, a bare parquet path cannot carry it).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      path: String,
      keyCols: Seq[String],
      numBuckets: Int,
      sorted: Boolean = true): Unit = {
    require(keyCols.nonEmpty, "at least one bucket key required")
    require(numBuckets > 0, "numBuckets must be positive")
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    val w = df.write.mode("overwrite").format("parquet")
      .option("path", path)
      .bucketBy(numBuckets, keyCols.head, keyCols.tail: _*)
    (if (sorted) w.sortBy(keyCols.head, keyCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Inner equi-join of two catalog tables on `keyCols`, hinted to
    * sort-merge (the strategy that exploits co-located buckets; a
    * broadcast would hide the layout). When both tables are bucketed
    * on (keyCols, same numBuckets), the physical plan has ZERO
    * ShuffleExchange nodes — verify with [[isShuffleFree]].
    */
  def colocatedJoin(
      spark: SparkSession,
      table1: String,
      table2: String,
      keyCols: Seq[String]): DataFrame =
    spark.table(table1).hint("merge")
      .join(spark.table(table2).hint("merge"), keyCols)

  /** True when the compiled physical plan moves no rows: no shuffle
    * Exchange anywhere (the property bucketing buys). Inspects the
    * rendered plan rather than collecting node types because
    * AdaptiveSparkPlanExec hides its inner plan from `collect` —
    * broadcast exchanges (which move no fact rows) are not counted.
    */
  def isShuffleFree(df: DataFrame): Boolean = {
    val s = df.queryExecution.executedPlan.toString
    !(s.contains("Exchange hashpartitioning") ||
      s.contains("Exchange rangepartitioning") ||
      s.contains("Exchange SinglePartition"))
  }
}
