package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.api._
import graft.core.GraphStore
import graft.ext._
import graft.streaming.StreamingIngest

/** Structured Streaming ingest (§2.12 extension): micro-batches applied
  * as per-user serialized bulk adds.
  */
class StreamingSpec extends SparkSuite {

  private def mkManagers(): (collection.mutable.Map[String, MemoryManager], String => MemoryManager) = {
    val store = new GraphStore(spark)
    val cache = collection.mutable.Map[String, MemoryManager]()
    val factory = (user: String) =>
      cache.getOrElseUpdate(user, new MemoryManager(
        spark, MemoryConfig(userId = user), store, new MockEmbedder(16),
        new ScriptedExtractor(Nil), new AddAllReconciler))
    (cache, factory)
  }

  test("foreachBatch ingest: per-user grouping, event order, bulk adds") {
    val (cache, factory) = mkManagers()
    val ingest = new StreamingIngest(factory)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, Long)]
    val events = stream.toDF().toDF("user_id", "text", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val query = ingest.start(events, dir)
    try {
      stream.addData(
        ("alice", "a-second", 2000L), ("bob", "b-first", 1000L),
        ("alice", "a-first", 1000L))
      query.processAllAvailable()
      stream.addData(("alice", "a-third", 3000L))
      query.processAllAvailable()
    } finally query.stop()

    // within-user event order preserved across micro-batches (ids ascend)
    val alice = cache("alice").getAll().sortBy(_.memoryId.toLong).map(_.text)
    assert(alice == Seq("a-first", "a-second", "a-third"))
    assert(cache("bob").getAll().map(_.text) == Seq("b-first"))
  }

  test("reconciling ingest: later micro-batch UPDATE supersedes an earlier batch's memory") {
    // W2b streaming face: cross-batch semantics are sequential, so a
    // scripted UPDATE arriving in micro-batch 2 must expire the memory
    // micro-batch 1 created, with the full SCD2 trail
    val store = new GraphStore(spark)
    // batch 1 hits the empty-store fast path (all-ADD, reconciler not
    // consulted); only batch 2 consumes a scripted decision
    val decisions = Seq(
      Seq(Decision(DecisionAction.Update, "alice moved to beta", Some(1L))))
    val mgr = new MemoryManager(
      spark, MemoryConfig(userId = "alice", reconciliationThreshold = 0.0),
      store, new MockEmbedder(16),
      new ScriptedExtractor(Seq(
        Extraction(Seq("alice works at acme"), Nil, Nil),
        Extraction(Seq("alice moved to beta"), Nil, Nil))),
      new ScriptedReconciler(decisions))
    val ingest = new StreamingIngest(_ => mgr)
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val stream = MemoryStream[(String, String, Long)]
    val events = stream.toDF().toDF("user_id", "text", "ts")
    val dir = java.nio.file.Files.createTempDirectory("graft-stream-rec").toString
    val query = ingest.startReconciling(events, dir)
    try {
      stream.addData(("alice", "m1", 1000L))
      query.processAllAvailable()
      stream.addData(("alice", "m2", 2000L))
      query.processAllAvailable()
    } finally query.stop()
    import org.apache.spark.sql.functions.col
    val mems = store.memories.select("id", "text", "expired_at").collect()
      .map(r => (r.getLong(0), r.getString(1), r.isNullAt(2))).sortBy(_._1)
    assert(mems.map(m => (m._1, m._2)).toSeq ==
      Seq((1L, "alice works at acme"), (2L, "alice moved to beta")))
    assert(!mems(0)._3 && mems(1)._3) // id 1 expired by batch 2's UPDATE
    val sup = store.edges.filter(col("edge_type") === graft.core.EdgeTypes.Supersedes)
      .select("src", "dst").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(sup.toSeq == Seq((2L, 1L)))
  }
}
