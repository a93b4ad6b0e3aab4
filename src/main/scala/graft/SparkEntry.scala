package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.catalog._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY §2 is registered here as a
  * named query over the driver-provided parquet tables, with matching
  * DuckDB oracle SQL (the driver's correctness gate compares Spark's
  * parquet output against the oracle per query: rows/schema/hash).
  */
object SparkEntry {

  private val catalogs: Seq[(Map[String, (SparkSession, String) => DataFrame], Map[String, String])] =
    Seq(
      (TextQueries.queries, TextQueries.oracle),
      (SimilarityQueries.queries, SimilarityQueries.oracle),
      (FilterQueries.queries, FilterQueries.oracle),
      (GraphQueries.queries, GraphQueries.oracle),
      (SearchQueries.queries, SearchQueries.oracle)
    )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q_text_stats")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalogs.map(_._1).reduce(_ ++ _)

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalogs.map(_._2).reduce(_ ++ _)

  /** Headline subset run by [[Bench]] at sf0.1; empty = all queries. */
  def benchQueries: Seq[String] = Nil
}
