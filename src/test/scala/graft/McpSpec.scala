package graft

import graft.api._
import graft.core._
import graft.ext._
import graft.mcp.MemoryTools
import graft.trace.{RecordingTracer, SpanRecord}

/** MCP-equivalent tool surface (mcp/tools.py:28-388) + span
  * instrumentation (_tracing.py / test_instrumentation.py equivalents).
  */
class McpSpec extends SparkSuite {

  private val T0 = 1700000000000L

  private def mkTools(tracer: graft.trace.Tracer = graft.trace.NoopTracer)
      : (MemoryTools, MemoryManager) = {
    var tick = 0L
    val m = new MemoryManager(spark, MemoryConfig(userId = "alice"),
      new GraphStore(spark), new MockEmbedder(16),
      new HeuristicExtractor, new AddAllReconciler,
      clock = () => { tick += 1; T0 + tick * 1000 }, tracer = tracer)
    (new MemoryTools(m), m)
  }

  test("all 11 reference tools are registered and dispatchable") {
    val (tools, _) = mkTools()
    val names = tools.describe.map(_.name)
    assert(names == Seq("memory_add", "memory_add_batch", "memory_search",
      "memory_update", "memory_delete", "memory_delete_all", "memory_list",
      "memory_summarize", "memory_history", "memory_stats",
      "memory_explain_search"))
    assert(tools.call("nope").contains("unknown tool"))
  }

  test("add / search / list / stats round-trip through tool dispatch") {
    val (tools, _) = mkTools()
    val added = tools.call("memory_add",
      Map("text" -> "Bob moved to Paris", "infer" -> false))
    assert(added.contains("\"events\"") && added.contains("\"ADD\""))
    val found = tools.call("memory_search", Map("query" -> "Bob moved to Paris", "k" -> 3))
    assert(found.contains("Bob moved to Paris"))
    assert(tools.call("memory_list").contains("Bob moved to Paris"))
    assert(tools.call("memory_stats").contains("\"total_memories\":1"))
  }

  test("batch add, update, history, delete, delete_all") {
    val (tools, _) = mkTools()
    val batch = tools.call("memory_add_batch",
      Map("texts" -> Seq("one", "two")))
    assert(batch.contains("\"memory_ids\":[\"1\",\"2\"]"))
    assert(tools.call("memory_update",
      Map("memory_id" -> "1", "text" -> "uno")).contains("true"))
    val hist = tools.call("memory_history", Map("memory_id" -> "1"))
    assert(hist.contains("\"ADD\"") && hist.contains("\"UPDATE\""))
    assert(tools.call("memory_delete", Map("memory_id" -> "2")).contains("true"))
    assert(tools.call("memory_delete_all").contains("\"deleted_count\":1"))
  }

  test("errors become {error: ...} instead of propagating (tools.py contract)") {
    val (tools, _) = mkTools()
    assert(tools.call("memory_add").contains("\"error\""))
    assert(tools.call("memory_update", Map("memory_id" -> "notanum",
      "text" -> "x")).contains("\"error\""))
  }

  test("spans record engine ops with nesting and durations") {
    val tracer = new RecordingTracer
    val (tools, m) = mkTools(tracer)
    tools.call("memory_add", Map("text" -> "Alice works at Acme."))
    m.search("acme", k = 3)
    val spans = tracer.spans
    val names = spans.map(_.name)
    assert(names.contains("memory.add"))
    assert(names.contains("memory.search"))
    assert(names.contains("memory.candidate_search"))
    // nesting: candidate_search ran inside add
    val cand = spans.find(_.name == "memory.candidate_search").get
    assert(cand.parent == "memory.add")
    assert(spans.forall(_.durationNanos > 0))
    assert(spans.forall(_.error.isEmpty))
    // a throwing op still records its span, with the error class
    intercept[IllegalArgumentException] {
      m.setImportance("1", 7.0)
    }
    // setImportance isn't traced; force one through a traced op instead
    val t2 = new RecordingTracer
    val m2 = new MemoryManager(spark, MemoryConfig(userId = "x"),
      new GraphStore(spark), new MockEmbedder(16),
      new ScriptedExtractor(Nil), new AddAllReconciler, tracer = t2)
    intercept[NumberFormatException] { m2.update("bad_id", "t") }
    val rec: SpanRecord = t2.spans.find(_.name == "memory.update").get
    assert(rec.error.contains("NumberFormatException"))
  }

  test("resources: memory://config and memory://stats mirror resources.py") {
    val (tools, _) = mkTools()
    assert(tools.resources.map(_.uri) == Seq("memory://config", "memory://stats"))
    val cfg = tools.readResource("memory://config")
    assert(cfg.contains("\"default_user_id\":\"alice\""))
    assert(cfg.contains("\"model\":\"HeuristicExtractor+MockEmbedder\""))
    assert(cfg.contains("\"enable_importance\":false"))
    assert(cfg.contains("\"instrument\":false"))
    tools.call("memory_add", Map("text" -> "Bob moved to Paris", "infer" -> false))
    val st = tools.readResource("memory://stats")
    assert(st.contains("\"total_memories\":1"))
    assert(st.contains("\"semantic_count\":1"))
    assert(st.contains("\"relation_count\":0"))
    assert(tools.readResource("memory://nope").contains("unknown resource"))
  }

  test("prompts: manage_memories and knowledge_capture render with optional args") {
    val (tools, _) = mkTools()
    assert(tools.prompts.map(_.name) == Seq("manage_memories", "knowledge_capture"))
    val manage = tools.prompt("manage_memories")
    // the 5-step workflow over the tool surface (prompts.py:11-29)
    Seq("SEARCH FIRST", "memory_search", "memory_add", "memory_update",
      "memory_list", "memory_summarize").foreach(s => assert(manage.contains(s)))
    assert(!manage.contains("Focus on the topic"))
    assert(tools.prompt("manage_memories", Map("topic" -> "travel"))
      .endsWith("Focus on the topic: travel"))
    val capture = tools.prompt("knowledge_capture", Map("text" -> "Doc body"))
    Seq("READ", "memory_add_batch", "VERIFY").foreach(s => assert(capture.contains(s)))
    assert(capture.endsWith("Text to capture:\nDoc body"))
    assert(tools.prompt("nope").contains("unknown prompt"))
  }
}
