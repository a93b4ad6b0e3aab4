package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Forced-pressure experiment behind the q_clustering wedge-volume
  * bound (VERDICT r11 #2): run [[graft.ops.GraphAlgorithms.localClustering]]
  * over the sf co-purchase graph under a CONSTRAINED heap (launch with
  * -Xmx2g; the bench runs at -Xmx8g), with the closure join sized by
  * the bound (wedgeRowsPerTask = 2M, the shipped default) vs unbounded
  * (Long.MaxValue = the pre-r12 plan shape: wedge volume / 32 rows per
  * task). Prints wall + spill bytes per variant so BASELINE records how
  * the bound degrades under memory pressure vs the old shape.
  *
  * Usage: java -Xmx2g ... graft.tools.ClusteringPressureProbe <sfDir>
  */
object ClusteringPressureProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val spillMem = new java.util.concurrent.atomic.AtomicLong(0L)
    val spillDisk = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            spillMem.addAndGet(m.memoryBytesSpilled)
            spillDisk.addAndGet(m.diskBytesSpilled)
          }
        }
      })
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    def edges: DataFrame = li.as("x").join(li.as("y"),
        col("x.ok") === col("y.ok") && col("x.pk") < col("y.pk"))
      .select(col("x.pk").as("src"), col("y.pk").as("dst"))

    // closureBroadcastEdges = 0 pins the SHUFFLED closure path — the
    // wedgeRowsPerTask bound this probe measures only exists there (the
    // r15 default broadcasts the closure side and has no wedge shuffle
    // to size); the final row measures the broadcast path itself
    def run(label: String, rowsPerTask: Long,
        broadcastEdges: Long = 0L): Unit = {
      Thread.sleep(500)
      spillMem.set(0L); spillDisk.set(0L)
      val t0 = System.nanoTime()
      val n = graft.ops.GraphAlgorithms
        .localClustering(edges, wedgeRowsPerTask = rowsPerTask,
          closureBroadcastEdges = broadcastEdges).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let stage-completed posts drain
      println(f"$label%-12s wall=$wall%.2f s rows=$n " +
        f"parts=${graft.ops.GraphAlgorithms.lastWedgeParts} " +
        f"spill_mem=${spillMem.get()} spill_disk=${spillDisk.get()} " +
        f"heap_max=${Runtime.getRuntime.maxMemory() / (1 << 20)}MiB")
      System.gc()
    }
    // unbounded FIRST so its (worse) behavior cannot benefit from pages
    // the bounded run warmed; each variant twice, second is steady-state
    run("unbounded", Long.MaxValue)
    run("unbounded2", Long.MaxValue)
    run("bounded", 2000000L)
    run("bounded2", 2000000L)
    // force activation (sf0.1 has 41M oriented wedges, so the default
    // bound leaves parts at 32): these show what the knob costs WHEN it
    // widens the closure join
    run("bound500k", 500000L)
    run("bound125k", 125000L)
    run("broadcast", 2000000L, broadcastEdges = Long.MaxValue)
    run("broadcast2", 2000000L, broadcastEdges = Long.MaxValue)
    spark.stop()
  }
}
