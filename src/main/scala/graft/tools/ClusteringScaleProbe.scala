package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Core-scaling probe for the r15 broadcast-closure clustering path at
  * REAL data volume (VERDICT r14 #6: at sf0.1 every timed row reads a
  * 32-vs-8-core ratio ≈ 1 because per-stage fixed costs dominate — this
  * generates a deterministic synthetic graph big enough that compute
  * dominates and the ratio is meaningful). spark.range-derived edges:
  * no testdata dependency, nothing cached across runs.
  *
  * Run: SPARK_GRAFT_CPUS=32|8 sbt "runMain graft.tools.ClusteringScaleProbe [n] [m]"
  */
object ClusteringScaleProbe {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val m = if (args.length > 1) args(1).toLong else 4000000L
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val edges = spark.range(0L, m, 1, 32)
      .select(
        pmod(col("id") * 2654435761L, lit(n)).as("src"),
        pmod((col("id") + 7L) * 40503L + col("id") % 97L, lit(n)).as("dst"))
      .localCheckpoint()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val rows = graft.ops.GraphAlgorithms.localClustering(edges)
      rows.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[cluscale] cpus=$cpus n=$n m=$m run$i wall=$sec%.2f s " +
        f"(wedge parts telemetry=${graft.ops.GraphAlgorithms.lastWedgeParts})")
    }
    spark.stop()
  }
}
