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
}
