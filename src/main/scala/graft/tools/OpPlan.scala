package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool: formatted physical plans for op DATAFLOWS that the
  * registered queries memoize behind a localCheckpoint (graft.Plans on
  * those queries explains only the post-checkpoint scan). Builds the
  * same inputs the catalog uses and explains the raw operator output.
  *
  * Usage: runMain graft.tools.OpPlan <sfDir> <op> [outFile]
  * Ops: clustering (localClustering over the full co-purchase graph;
  * SPARK_GRAFT_CLU_BCAST overrides closureBroadcastEdges — 0 pins the
  * pre-r15 shuffled closure path for before/after pairs).
  */
object OpPlan {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val op = args(1)
    val outFile = args.lift(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def coPurchase: DataFrame = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))
    val df = op match {
      case "clustering" =>
        val bcast = sys.env.get("SPARK_GRAFT_CLU_BCAST").map(_.toLong)
        bcast match {
          case Some(b) => graft.ops.GraphAlgorithms
            .localClustering(coPurchase, closureBroadcastEdges = b)
          case None => graft.ops.GraphAlgorithms.localClustering(coPurchase)
        }
      case other => sys.error(s"unknown op: $other")
    }
    val txt = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    outFile match {
      case Some(f) =>
        java.nio.file.Files.createDirectories(
          java.nio.file.Paths.get(f).toAbsolutePath.getParent)
        val w = new java.io.PrintWriter(f, "UTF-8")
        try w.println(txt) finally w.close()
        println(s"[opplan] $op plan written to $f")
      case None => println(txt)
    }
    spark.stop()
  }
}
