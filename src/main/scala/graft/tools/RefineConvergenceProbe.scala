package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.GraphAlgorithms

/** Telemetry behind the refinement's stable-cycle early exit: on the
  * bench contains-graph (the graph q_communities_refined runs on), at
  * what round does the mod-4 residue schedule reach its zero-move
  * fixpoint, and what does running PAST the shipped 16-round cap buy in
  * modularity? Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.01 \
  *     sbt -batch "runMain graft.tools.RefineConvergenceProbe"
  * Results recorded in BASELINE §7d.
  */
object RefineConvergenceProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
      .localCheckpoint()
    val seed = GraphAlgorithms.labelPropagation(edges, 5).localCheckpoint()

    def run(cap: Int, early: Boolean): Unit = {
      val t0 = System.nanoTime()
      val part = GraphAlgorithms.refineCommunities(edges, seed, rounds = cap,
        stopOnStableCycle = early).localCheckpoint()
      val secs = (System.nanoTime() - t0) / 1e9
      val q = GraphAlgorithms.modularity(edges, part).collect()(0).getDouble(0)
      val nComm = part.select("community").distinct().count()
      println(f"[refine-probe] cap=$cap%-3d early=$early%-5s " +
        f"rounds=${GraphAlgorithms.lastRefineRounds}%-3d " +
        f"secs=$secs%7.2f Q=$q%.4f communities=$nComm")
    }
    run(16, early = false) // the shipped bench configuration, pre-exit
    run(16, early = true)  // what the bench row now runs
    run(64, early = true)  // where the schedule actually converges
    spark.stop()
  }
}
