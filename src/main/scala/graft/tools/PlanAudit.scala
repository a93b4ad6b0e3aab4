package graft.tools

import org.apache.spark.sql.SparkSession

/** Prints the formatted physical plan of named registry queries —
  * the .explain audit loop the build rules require per new operator.
  * Usage: runMain graft.tools.PlanAudit <sfDir> <query...>
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val registry = graft.SparkEntry.queries ++
      graft.SparkEntry.benchExtras ++ graft.SparkEntry.benchUntimed
    args.drop(1).foreach { q =>
      println(s"===== $q =====")
      registry(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
