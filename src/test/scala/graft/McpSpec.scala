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

  test("stdio transport: full JSON-RPC session end-to-end over a real pipe") {
    import java.io.{PipedInputStream, PipedOutputStream}
    import com.fasterxml.jackson.databind.ObjectMapper
    val (tools, _) = mkTools()
    val server = new graft.mcp.McpStdioServer(tools)
    val clientOut = new PipedOutputStream() // client -> server
    val serverIn = new PipedInputStream(clientOut, 1 << 16)
    val serverOut = new PipedOutputStream() // server -> client
    val clientIn = new PipedInputStream(serverOut, 1 << 16)
    val t = new Thread(() => server.serve(serverIn, serverOut), "mcp-stdio")
    t.setDaemon(true)
    t.start()
    val w = new java.io.PrintWriter(clientOut, true)
    val r = new java.io.BufferedReader(new java.io.InputStreamReader(clientIn))
    val mapper = new ObjectMapper()
    def rpc(line: String): com.fasterxml.jackson.databind.JsonNode = {
      w.println(line); mapper.readTree(r.readLine())
    }

    val init = rpc("""{"jsonrpc":"2.0","id":1,"method":"initialize","params":{"protocolVersion":"2024-11-05","capabilities":{},"clientInfo":{"name":"test","version":"0"}}}""")
    assert(init.at("/result/serverInfo/name").asText() == "graft-memory")
    assert(init.at("/result/capabilities/tools").isObject)
    w.println("""{"jsonrpc":"2.0","method":"notifications/initialized"}""") // no reply

    val list = rpc("""{"jsonrpc":"2.0","id":2,"method":"tools/list"}""")
    val toolNames = (0 until list.at("/result/tools").size())
      .map(i => list.at(s"/result/tools/$i/name").asText())
    assert(toolNames.contains("memory_add") && toolNames.size == 11)
    assert(list.at("/result/tools/0/inputSchema/type").asText() == "object")
    assert(list.at("/result/tools/0/inputSchema/required/0").asText() == "text")

    val add = rpc("""{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"memory_add","arguments":{"text":"Bob moved to Paris","infer":false}}}""")
    assert(!add.at("/result/isError").asBoolean())
    assert(add.at("/result/content/0/text").asText().contains("\"ADD\""))

    val found = rpc("""{"jsonrpc":"2.0","id":4,"method":"tools/call","params":{"name":"memory_search","arguments":{"query":"Bob moved to Paris","k":3}}}""")
    assert(found.at("/result/content/0/text").asText().contains("Bob moved to Paris"))

    val res = rpc("""{"jsonrpc":"2.0","id":5,"method":"resources/read","params":{"uri":"memory://stats"}}""")
    assert(res.at("/result/contents/0/text").asText().contains("\"total_memories\":1"))

    val prompt = rpc("""{"jsonrpc":"2.0","id":6,"method":"prompts/get","params":{"name":"manage_memories","arguments":{"topic":"travel"}}}""")
    assert(prompt.at("/result/messages/0/content/text").asText()
      .endsWith("Focus on the topic: travel"))

    // error contract: bad tool args -> isError content, not a crash;
    // unknown method -> -32601; parse error -> -32700
    val bad = rpc("""{"jsonrpc":"2.0","id":7,"method":"tools/call","params":{"name":"memory_add","arguments":{}}}""")
    assert(bad.at("/result/isError").asBoolean())
    val unknown = rpc("""{"jsonrpc":"2.0","id":8,"method":"no/such"}""")
    assert(unknown.at("/error/code").asInt() == -32601)
    val garbled = rpc("""{nope""")
    assert(garbled.at("/error/code").asInt() == -32700)

    // EOF shuts the loop down cleanly
    w.close()
    t.join(10000)
    assert(!t.isAlive)
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
