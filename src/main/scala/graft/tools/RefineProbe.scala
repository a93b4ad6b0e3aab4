package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

/** One-off decomposition of q_communities_refined (the r15 top row):
  * LPA seed vs refinement rounds, with executed-round telemetry and
  * stage/task/cpu attribution per phase. Honors SPARK_GRAFT_SF_DIR /
  * SPARK_GRAFT_CPUS.
  */
object RefineProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val cpuNs = new java.util.concurrent.atomic.AtomicLong()
    val shufW = new java.util.concurrent.atomic.AtomicLong()
    val byName = new java.util.concurrent.ConcurrentHashMap[String, Array[Long]]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet(); tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          cpuNs.addAndGet(m.executorCpuTime)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          val key = s.stageInfo.name.takeWhile(_ != '\n').take(60)
          byName.compute(key, (_, v) => {
            val a = if (v == null) Array(0L, 0L, 0L) else v
            a(0) += 1; a(1) += m.executorCpuTime
            a(2) += m.executorRunTime; a
          })
        }
        ()
      }
    })
    def time[T](name: String)(f: => T): T = {
      Thread.sleep(300)
      val (s0, t0c, c0, w0) = (stages.get(), tasks.get(), cpuNs.get(), shufW.get())
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[refineprobe] $name%-28s $sec%7.2f s stages=${stages.get() - s0}%4d tasks=${tasks.get() - t0c}%5d exec_cpu=${(cpuNs.get() - c0) / 1e9}%7.2f s shuf_w=${(shufW.get() - w0) / 1e6}%8.1f MB")
      r
    }
    val edges = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey").as("src"), col("l_partkey").as("dst"))
    val seed = time("lpa seed (5 rounds)") {
      val s = graft.ops.GraphAlgorithms.labelPropagation(edges, 5)
        .localCheckpoint()
      s.count(); s
    }
    (1 to 2).foreach { i =>
      time(s"refine 16x4 run $i") {
        graft.ops.GraphAlgorithms.refineCommunities(edges, seed, 16, 4)
          .write.format("noop").mode("overwrite").save()
      }
      println(s"[refineprobe] executed rounds = ${graft.ops.GraphAlgorithms.lastRefineRounds}")
    }
    import scala.jdk.CollectionConverters._
    byName.asScala.toSeq.sortBy(-_._2(1)).take(12).foreach { case (k, a) =>
      println(f"[refinestage] ${a(0)}%4d stages cpu=${a(1) / 1e9}%8.2f s run=${a(2) / 1e3}%8.1f s  $k")
    }

    // ---- hand-built single LPA-shaped round, piecewise ----
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val dir2 = edges.select(col("src"), col("dst"))
    val und = dir2.unionByName(dir2.select(col("dst").as("src"), col("src").as("dst")))
      .distinct().filter(col("src") =!= col("dst"))
      .repartition(col("dst")).localCheckpoint()
    val labels = und.select(col("src").as("node")).distinct()
      .repartition(col("node")).withColumn("label", col("node"))
      .localCheckpoint()
    println(s"[decomp] und rows=${und.count()} labels=${labels.count()}")
    (1 to 2).foreach { pass =>
      time(s"p$pass und scan only")(noop(und))
      time(s"p$pass join only") {
        noop(und.join(labels.hint("shuffle_hash"), und("dst") === labels("node"))
          .select(und("src").as("node"), col("label")))
      }
      time(s"p$pass join+repart+agg") {
        noop(und.join(labels.hint("shuffle_hash"), und("dst") === labels("node"))
          .select(und("src").as("node"), col("label"))
          .repartition(col("node"))
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt")))
      }
      time(s"p$pass full lpa round") {
        noop(und.join(labels.hint("shuffle_hash"), und("dst") === labels("node"))
          .select(und("src").as("node"), col("label"))
          .repartition(col("node"))
          .groupBy(col("node"), col("label")).agg(count(lit(1)).as("cnt"))
          .groupBy(col("node"))
          .agg(max_by(col("label"), struct(col("cnt"), -col("label"))).as("label")))
      }
    }
    spark.stop()
  }
}
