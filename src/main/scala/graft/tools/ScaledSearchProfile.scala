package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler._

import graft.api.{MemoryConfig, MemoryManager}
import graft.core.GraphStore
import graft.ext._

/** Ad-hoc profiler for q_pipeline_search_scaled (the warm-store staged
  * search over the full-corpus store): builds the same store the bench
  * memoizes, then times repeated searches with per-search job/stage/task
  * attribution and store-table partition counts — the witnesses behind
  * the row's 2.3× wall variance and 0.29 core-scaling ratio (VERDICT
  * r14 #3). Honors SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS.
  */
object ScaledSearchProfile {
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
    import org.apache.spark.sql.functions._

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    val stages = new java.util.concurrent.atomic.AtomicInteger()
    val tasks = new java.util.concurrent.atomic.AtomicInteger()
    val stageWall = new java.util.concurrent.atomic.AtomicLong() // ms, sum over stages
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        for (a <- s.stageInfo.submissionTime; b <- s.stageInfo.completionTime)
          stageWall.addAndGet(b - a)
        ()
      }
    })

    def time[T](name: String)(f: => T): T = {
      Thread.sleep(300)
      val (j0, s0, t0c, w0) = (jobs.get(), stages.get(), tasks.get(), stageWall.get())
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"[scaledsearch] $name%-34s $sec%7.2f s  jobs=${jobs.get() - j0}%3d stages=${stages.get() - s0}%3d tasks=${tasks.get() - t0c}%5d stage_wall=${(stageWall.get() - w0) / 1000.0}%7.2f s")
      r
    }

    val texts = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .collect().map(_.getString(1)).toSeq
    val store = new GraphStore(spark, checkpointEvery = 64)
    val mgr = new MemoryManager(spark,
      MemoryConfig(userId = "bench-user", embeddingDimensions = 16,
        enableTopologyBoost = true, enableImportance = true),
      store, new MockEmbedder(16),
      new ScriptedExtractor(Nil), new AddAllReconciler)
    val T0 = 1700000000000L
    time(s"seed ${texts.size} docs") {
      texts.grouped(1000).zipWithIndex.foreach { case (chunk, i) =>
        mgr.addBatch(chunk, now = Some(T0 + i * 1000L))
      }
    }
    println(s"[scaledsearch] partitions: memories=${store.memories.rdd.getNumPartitions} " +
      s"edges=${store.edges.rdd.getNumPartitions} history=${store.history.rdd.getNumPartitions}")
    (1 to 5).foreach { i =>
      time(s"search $i") {
        mgr.search("key agg row scan slow fast table", k = 10,
          now = Some(T0 + 1000000L))
      }
    }
    spark.stop()
  }
}
