package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

import graft.api.{MemoryConfig, MemoryManager}
import graft.core.GraphStore
import graft.ext._

/** Ad-hoc profiler for the manager-path staged search (q_pipeline_search
  * latency budget): counts Spark jobs per search and times the search
  * under feature-flag bisections. Not part of the driver contract; run
  * with runMain graft.tools.SearchProfile.
  */
object SearchProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicInteger()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
    })

    def time[T](name: String)(f: => T): T = {
      Thread.sleep(200) // let listener drain
      val j0 = jobs.get()
      val t0 = System.nanoTime()
      val r = f
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(200)
      println(f"[searchprofile] $name%-42s $sec%7.2f s  jobs=${jobs.get() - j0}")
      r
    }

    def mkMgr(topo: Boolean, imp: Boolean): MemoryManager = {
      val store = new GraphStore(spark, checkpointEvery = 64)
      val mgr = new MemoryManager(spark,
        MemoryConfig(userId = "alice", embeddingDimensions = 16,
          enableTopologyBoost = topo, enableImportance = imp,
          reconciliationThreshold = 0.0),
        store, new MockEmbedder(16),
        new ScriptedExtractor(Nil), new AddAllReconciler)
      mgr
    }

    // scenario-equivalent store: 40 adds through the full pipeline
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("doc_id") < 40)
      .orderBy("doc_id")
      .select("text", "lang").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val T0 = 1700000000000L

    def seed(mgr: MemoryManager): Unit = {
      val exts = docs.map { case (t, l) =>
        Extraction(Seq(t), Seq(ExtractedEntity(l, "lang")), Nil) }
      val store = mgr.store
      val m2 = new MemoryManager(spark,
        MemoryConfig(userId = "alice", embeddingDimensions = 16,
          reconciliationThreshold = 0.0),
        store, new MockEmbedder(16),
        new ScriptedExtractor(exts.toSeq), new AddAllReconciler)
      docs.zipWithIndex.foreach { case ((t, _), i) =>
        m2.add(t, now = Some(T0 + i * 1000L)) }
    }

    val full = mkMgr(topo = true, imp = true)
    time("seed 40-add scenario store")(seed(full))
    time("search #1 (topo+importance)")(
      full.search("key agg row scan slow fast table", k = 10, now = Some(T0 + 1000000L)))
    time("search #2 (warm)")(
      full.search("key agg row scan slow fast table", k = 10, now = Some(T0 + 1000000L)))
    time("search #3 (warm)")(
      full.search("key agg row scan slow fast table", k = 10, now = Some(T0 + 1000000L)))

    val plain = mkMgr(topo = false, imp = false)
    time("seed store (plain)")(seed(plain))
    time("search plain #1")(
      plain.search("key agg row scan slow fast table", k = 10, now = Some(T0 + 1000000L)))
    time("search plain #2")(
      plain.search("key agg row scan slow fast table", k = 10, now = Some(T0 + 1000000L)))

    spark.stop()
  }
}
