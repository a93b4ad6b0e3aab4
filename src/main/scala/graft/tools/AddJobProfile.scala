package graft.tools

import java.util.concurrent.atomic.AtomicLong
import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.api._
import graft.core.GraphStore
import graft.ext._

/** Job-count profile of one reconciling point add — the per-add
  * latency BASELINE §8 attributes to "~6-10 Spark job round-trips":
  * this names them. Each Spark job started during a single `mgr.add`
  * is tallied by its call site (job description), so the breakdown
  * says which stage of the add pipeline pays how many scheduler
  * round-trips. Run:
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.001 \
  *     sbt -batch "runMain graft.tools.AddJobProfile"
  */
object AddJobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val P = 1000; val R = 20
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).orderBy(col("doc_id"))
      .limit(P).collect().map(_.getString(1)).toSeq
    val store = new GraphStore(spark, checkpointEvery = 64)
    val extractions = (0 until R).map(i => Extraction(Seq(docs(i)), Nil, Nil))
    val decisions = (0 until R).map(i =>
      Seq(Decision(DecisionAction.Update, "updated: " + docs(i), Some(i + 1L))))
    val rec = new graft.trace.RecordingTracer
    val mgr = new MemoryManager(
      spark, MemoryConfig(userId = "bench", embeddingDimensions = 16,
        reconciliationThreshold = 0.5),
      store, new MockEmbedder(16),
      new ScriptedExtractor(extractions), new ScriptedReconciler(decisions),
      tracer = rec)
    mgr.addBatch(docs, now = Some(1700000000000L))

    val count = new AtomicLong()
    val byDesc = mutable.Map[String, Long]().withDefaultValue(0L)
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        count.incrementAndGet(); ()
      }
      // SQL executions carry the action's call site as their description
      // ("collect at MemoryManager.scala:241") — that is the attribution
      // the job-level listener can't see (jobs submit from the SQL pool)
      override def onOtherEvent(e: org.apache.spark.scheduler.SparkListenerEvent): Unit =
        e match {
          case s: org.apache.spark.sql.execution.ui.SparkListenerSQLExecutionStart =>
            byDesc.synchronized { byDesc(s.description.take(90)) += 1 }
          case _ => ()
        }
    }
    spark.sparkContext.addSparkListener(listener)
    val t0 = System.nanoTime()
    try {
      (0 until R).foreach { i =>
        mgr.add(docs(i), now = Some(1700000000000L + (i + 1) * 1000L))
      }
      Thread.sleep(500)
    } finally spark.sparkContext.removeSparkListener(listener)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[add-profile] $R reconciling adds: ${count.get()} jobs, " +
      f"$secs%.2f s total (${count.get() / R.toDouble}%.1f jobs/add, " +
      f"${secs / R}%.2f s/add)")
    byDesc.toSeq.sortBy(-_._2).foreach { case (d, n) =>
      println(f"[add-profile]   $n%4d  $d")
    }
    rec.spans.groupBy(_.name).toSeq.sortBy(-_._2.map(_.durationNanos).sum)
      .foreach { case (n, ss) =>
        println(f"[add-profile] span $n%-28s n=${ss.size}%3d " +
          f"total=${ss.map(_.durationNanos).sum / 1e9}%7.2f s")
      }
    spark.stop()
  }
}
