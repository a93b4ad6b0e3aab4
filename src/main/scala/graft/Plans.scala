package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print formatted physical plans for selected catalog queries
  * — used to audit pushdown (PushedFilters/ReadSchema), join strategies
  * (broadcast vs shuffle) and WholeStageCodegen coverage.
  * Usage: runMain graft.Plans <sfDir> [queryName ...]
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("q_cosine_topk", "q_hybrid", "q_graph_topology", "q_dedup_lsh_pairs")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      SparkEntry.queries.get(n).foreach { fn =>
        println(s"\n========== $n ==========")
        fn(spark, sfDir).explain("formatted")
      }
    }
    spark.stop()
  }
}
