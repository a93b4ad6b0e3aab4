package graft.tools

import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe (r14): does `Dataset.observe` deliver its metrics when the
  * action is an eager `localCheckpoint` (the iterative loops' per-round
  * materialization), and what does piggybacking a convergence probe on
  * the checkpoint save vs running it as a separate action?
  *
  * Usage: runMain graft.tools.ObserveProbe [iters=50]
  */
object ObserveProbe {
  def main(args: Array[String]): Unit = {
    val iters = if (args.nonEmpty) args(0).toInt else 50
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.range(0L, 200000L, 1, 8)
      .select(col("id"), (col("id") % 7).as("moved"))
      .localCheckpoint()

    // correctness: does the metric arrive, and does it match?
    val obs0 = Observation("probe0")
    val ck0 = base.observe(obs0, sum(col("moved")).as("m"), count(lit(1)).as("n"))
      .localCheckpoint()
    println(s"observe-on-checkpoint metrics: ${obs0.get}  (rows=${ck0.count()})")

    def timed(label: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      val s = (System.nanoTime() - t0) / 1e9
      println(f"$label%-12s total $s%7.3f s   per-iter ${s / iters * 1000}%7.1f ms")
    }

    timed("ckpt+agg") {
      (1 to iters).foreach { _ =>
        val ck = base.select(col("id"), col("moved")).localCheckpoint()
        ck.agg(coalesce(sum(col("moved")), lit(0L))).first().getLong(0)
        ck.unpersist(false)
      }
    }

    timed("ckpt+observe") {
      (1 to iters).foreach { i =>
        val obs = Observation(s"probe$i")
        val ck = base.select(col("id"), col("moved"))
          .observe(obs, coalesce(sum(col("moved")), lit(0L)).as("m"))
          .localCheckpoint()
        obs.get("m").asInstanceOf[Long]
        ck.unpersist(false)
      }
    }

    spark.stop()
  }
}
