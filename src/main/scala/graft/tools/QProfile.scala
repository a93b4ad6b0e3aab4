package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphAlgorithms

/** Ad-hoc stage profiler for the expensive iterative queries — not part
  * of the driver contract; run with runMain graft.tools.QProfile.
  */
object QProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[qprofile] $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val edges = li.select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))

    time("pagerank 20 iters")(
      GraphAlgorithms.pageRank(edges, 20).agg(sum("pagerank")).collect())
    time("pagerank 20 iters (2nd)")(
      GraphAlgorithms.pageRank(edges, 20).agg(sum("pagerank")).collect())
    time("lpa 5 rounds")(
      GraphAlgorithms.labelPropagation(edges, 5).agg(sum("community")).collect())
    time("lpa 5 rounds (2nd)")(
      GraphAlgorithms.labelPropagation(edges, 5).agg(sum("community")).collect())
    spark.stop()
  }
}
