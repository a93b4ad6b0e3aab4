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

    // experiment: single-exchange LPA round — repartition(node) BEFORE
    // the (node,label) count so both aggregation levels are satisfied by
    // hash(node); trades away map-side combine on the first level
    def lpaAlt(edges: org.apache.spark.sql.DataFrame, rounds: Int) = {
      val dir = edges.select(col("src"), col("dst"))
      val und = dir.unionByName(dir.select(col("dst").as("src"), col("src").as("dst")))
        .distinct().filter(col("src") =!= col("dst"))
        .repartition(col("dst")).localCheckpoint()
      val nodes = und.select(col("src").as("node")).distinct()
        .repartition(col("node")).localCheckpoint()
      var labels = nodes.withColumn("label", col("node"))
      var lastCkpt: org.apache.spark.sql.DataFrame = null
      for (i <- 1 to rounds) {
        val counted = und
          .join(labels.hint("shuffle_hash"), und("dst") === labels("node"))
          .select(und("src").as("node"), col("label"))
          .repartition(col("node"))
          .groupBy(col("node"), col("label"))
          .agg(count(lit(1)).as("cnt"))
        val next = counted.groupBy(col("node"))
          .agg(max_by(col("label"), struct(col("cnt"), -col("label"))).as("label"))
        if (i % 2 == 0 || i == rounds) {
          val ck = next.localCheckpoint()
          if (lastCkpt != null) lastCkpt.unpersist(blocking = false)
          lastCkpt = ck; labels = ck
        } else labels = next
      }
      labels.select(col("node"), col("label").as("community"))
    }
    time("lpa-alt 5 rounds")(lpaAlt(edges, 5).agg(sum("community")).collect())
    time("lpa-alt 5 rounds (2nd)")(lpaAlt(edges, 5).agg(sum("community")).collect())
    spark.stop()
  }
}
