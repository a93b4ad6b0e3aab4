package graft

import graft.api._
import graft.core.GraphStore
import graft.ext._

/** Per-user write serialization (SURVEY §7.4 risk 5; reference per-user
  * asyncio lock manager.py:283-284) + extraction fallback ladder
  * (§7.4 risk 7).
  */
class ConcurrencySpec extends SparkSuite {

  private val T0 = 1700000000000L

  test("concurrent adds for one user serialize: no lost writes, unique ids") {
    val m = new MemoryManager(spark, MemoryConfig(userId = "alice"),
      new GraphStore(spark), new MockEmbedder(16),
      new ScriptedExtractor(Nil), new AddAllReconciler)
    val threads = (1 to 4).map { t =>
      new Thread(() => (1 to 5).foreach { i =>
        m.add(s"t$t-fact-$i", infer = false, now = Some(T0 + t * 100 + i))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    val all = m.getAll()
    assert(all.size == 20)
    assert(all.map(_.memoryId).distinct.size == 20)
    assert(all.map(_.memoryId.toLong).max == 20L) // dense id allocation
  }

  test("cross-user concurrent writers on a SHARED store lose no writes") {
    // per-user manager locks don't cover different users sharing one
    // store — the store itself serializes mutations
    val store = new GraphStore(spark)
    def mgr(user: String) = new MemoryManager(spark, MemoryConfig(userId = user),
      store, new MockEmbedder(16), new ScriptedExtractor(Nil), new AddAllReconciler)
    val users = Seq("alice", "bob", "carol")
    val threads = users.map { u =>
      val m = mgr(u)
      new Thread(() => (1 to 5).foreach { i =>
        m.add(s"$u-fact-$i", infer = false, now = Some(T0 + i))
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(store.memories.count() == 15)
    users.foreach(u => assert(mgr(u).getAll().size == 5))
  }

  test("access bumps do not retrigger whole-graph metric recompute") {
    val m = new MemoryManager(spark,
      MemoryConfig(userId = "alice", enableGraphAlgorithms = true,
        enableImportance = true),
      new GraphStore(spark), new MockEmbedder(16),
      new ScriptedExtractor(Seq(Extraction(Seq("alice works at acme"),
        Seq(ExtractedEntity("alice", "person")), Nil))),
      new AddAllReconciler)
    m.add("Alice works at Acme", now = Some(T0))
    m.search("alice works at acme", k = 5) // computes metrics + bumps access
    val gvAfterFirst = m.store.graphVersion
    m.search("alice works at acme", k = 5) // bumpAccess only — no edges
    assert(m.store.graphVersion == gvAfterFirst) // dirty flag stays clean
  }

  test("combined-extraction failure falls back to separate legs") {
    val extractor = new FailingThenScriptedExtractor(
      failures = 1,
      outputs = Seq(Extraction(
        Seq("alice works at acme"),
        Seq(ExtractedEntity("alice", "person")),
        Nil)))
    val m = new MemoryManager(spark, MemoryConfig(userId = "alice"),
      new GraphStore(spark), new MockEmbedder(16), extractor, new AddAllReconciler)
    val r = m.add("Alice works at Acme", now = Some(T0))
    // fallback produced the scripted facts + entities despite the throw
    assert(r.events.map(_.event) == Seq("ADD"))
    assert(r.events.head.text == "alice works at acme")
    assert(m.store.entities.count() == 1)
  }
}
