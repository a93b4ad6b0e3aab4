package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.GraphAlgorithms

/** Scale check for the modularity refinement pass: on synthetic uniform
  * and 10%-hub graphs (same generators as [[LpaSkewBench]]), time the
  * LPA seed and the refinement rounds separately and score both
  * partitions, so the per-round refinement cost and its quality yield
  * are recorded at bench scale. Prints one JSON line; the recorded
  * series lives in BASELINE.
  *
  * Run: sbt -batch "runMain graft.RefineScaleBench [nodes] [edges] [rounds]"
  */
object RefineScaleBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 1000000L
    val m = if (args.length > 1) args(1).toLong else 8000000L
    val rounds = if (args.length > 2) args(2).toInt else 12
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def edges(hub: Boolean): DataFrame = {
      val base = spark.range(0L, m, 1, 32)
        .select(
          pmod(col("id") * 2654435761L, lit(n)).as("src"),
          pmod((col("id") + 7L) * 40503L + col("id") % 97L, lit(n)).as("dst"))
      (if (hub) base.select(col("src"),
        when(pmod(col("src") + col("dst"), lit(10L)) === 0L, lit(0L))
          .otherwise(col("dst")).as("dst"))
      else base).localCheckpoint()
    }

    val results = Seq("uniform" -> edges(hub = false), "hub10" -> edges(hub = true))
      .flatMap { case (gname, g) =>
        val t0 = System.nanoTime()
        val seed = GraphAlgorithms.labelPropagation(g, rounds = 5).localCheckpoint()
        seed.count()
        val tSeed = (System.nanoTime() - t0) / 1e9
        val t1 = System.nanoTime()
        val refined = GraphAlgorithms.refineCommunities(g, seed, rounds)
          .localCheckpoint()
        refined.count()
        val tRefine = (System.nanoTime() - t1) / 1e9
        val qSeed = GraphAlgorithms.modularity(g, seed).collect().head.getDouble(0)
        val qRef = GraphAlgorithms.modularity(g, refined).collect().head.getDouble(0)
        Seq(
          s""""${gname}_lpa_sec":$tSeed""",
          s""""${gname}_refine_sec":$tRefine""",
          s""""${gname}_refine_sec_per_round":${tRefine / rounds}""",
          s""""${gname}_q_lpa":$qSeed""",
          s""""${gname}_q_refined":$qRef""")
      }
    println(s"""{"metric":"refine_scale","nodes":$n,"edges":$m,"rounds":$rounds,${results.mkString(",")}}""")
    spark.stop()
  }
}
