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

    // convergence telemetry (VERDICT r6 #4): max |Δrank| between
    // consecutive iteration counts, vs the reference's 1e-6 tolerance
    // (protocol.py:38-40). One extra full run per point — telemetry
    // only, never in the shipped query path.
    for (iters <- Seq(10, 20, 30, 40)) {
      val a = GraphAlgorithms.pageRank(edges, iters - 1)
        .withColumnRenamed("pagerank", "pr_a")
      val b = GraphAlgorithms.pageRank(edges, iters)
      val d = b.join(a, "node")
        .agg(max(abs(col("pagerank") - col("pr_a"))).as("max_delta"))
        .collect()(0).getDouble(0)
      println(f"[qprofile] pagerank max|Δ| at iter $iters%-3d = $d%.3e")
    }
    // ordering stability: what the engine actually consumes (top-k,
    // boosts) — top-100 set overlap and exact top-10 sequence at the
    // default 20 iterations vs the ~1e-6-converged 80
    locally {
      def topIds(iters: Int, k: Int) =
        GraphAlgorithms.pageRank(edges, iters)
          .orderBy(col("pagerank").desc, col("node").asc)
          .limit(k).collect().map(_.getLong(0)).toSeq
      val (t20, t80) = (topIds(20, 100), topIds(80, 100))
      println(s"[qprofile] pagerank top-100 overlap 20-vs-80 iters: " +
        s"${t20.toSet.intersect(t80.toSet).size}/100, " +
        s"top-10 sequence equal: ${t20.take(10) == t80.take(10)}")
    }
    time("lpa 5 rounds")(
      GraphAlgorithms.labelPropagation(edges, 5).agg(sum("community")).collect())
    time("lpa 5 rounds (2nd)")(
      GraphAlgorithms.labelPropagation(edges, 5).agg(sum("community")).collect())
    spark.stop()
  }
}
