package graft.mcp

import graft.api._
import graft.api.Json._

/** MCP-equivalent tool surface (reference mcp/tools.py:28-388, 11 tools):
  * a transport-agnostic registry mapping tool name + typed args to the
  * same JSON payloads the reference's MCP server returns. An MCP (or any
  * RPC) frontend binds `describe` to its tool-listing and `call` to its
  * dispatch; the engine layer stays free of protocol dependencies, which
  * build.sbt could not carry anyway.
  *
  * Error contract mirrors the reference: exceptions become
  * `{"error": "<message>"}` instead of propagating (tools.py catches per
  * tool), so a misbehaving call can't take down the serving loop.
  */
final class MemoryTools(m: MemoryManager) {

  /** One tool's metadata: name, human description, (param, type, required). */
  case class ToolSpec(name: String, description: String,
      params: Seq[(String, String, Boolean)])

  val describe: Seq[ToolSpec] = Seq(
    ToolSpec("memory_add", "Add a memory by extracting facts from text",
      Seq(("text", "string", true), ("memory_type", "string", false),
        ("infer", "boolean", false), ("session_id", "string", false))),
    ToolSpec("memory_add_batch", "Add many raw memories in one batch",
      Seq(("texts", "array<string>", true), ("memory_type", "string", false))),
    ToolSpec("memory_search", "Hybrid vector+graph search over memories",
      Seq(("query", "string", true), ("k", "integer", false),
        ("memory_type", "string", false), ("min_score", "number", false),
        ("point_in_time", "integer", false))),
    ToolSpec("memory_update", "Overwrite one memory's text",
      Seq(("memory_id", "string", true), ("text", "string", true))),
    ToolSpec("memory_delete", "Hard-delete one memory",
      Seq(("memory_id", "string", true))),
    ToolSpec("memory_delete_all", "Delete every memory in scope", Nil),
    ToolSpec("memory_list", "List all memories in scope",
      Seq(("memory_type", "string", false))),
    ToolSpec("memory_summarize", "Consolidate old memories into summaries", Nil),
    ToolSpec("memory_history", "Change history of one memory",
      Seq(("memory_id", "string", true))),
    ToolSpec("memory_stats", "Counts by label/type/expiry", Nil),
    ToolSpec("memory_explain_search", "Search with per-stage explain trace",
      Seq(("query", "string", true), ("k", "integer", false)))
  )

  /** One resource's metadata (reference mcp/resources.py: memory://
    * URIs exposing read-only engine state).
    */
  case class ResourceSpec(uri: String, description: String)

  val resources: Seq[ResourceSpec] = Seq(
    ResourceSpec("memory://config",
      "Current configuration: model, scope ids, enabled features"),
    ResourceSpec("memory://stats",
      "Memory system statistics: node/edge counts scoped to memory data")
  )

  /** Read one resource (resources.py:13-48). Same error contract as
    * tool dispatch: unknown URIs and failures become {"error": ...}.
    */
  def readResource(uri: String): String =
    try {
      uri match {
        case "memory://config" =>
          val c = m.config
          jobj(
            "model" -> js(m.modelDescription),
            "graph_name" -> jopt(c.graphName),
            "default_user_id" -> js(c.userId),
            "agent_id" -> jopt(c.agentId),
            "run_id" -> jopt(c.runId),
            "enable_importance" -> c.enableImportance.toString,
            "enable_vision" -> c.enableVision.toString,
            "enable_topology_boost" -> c.enableTopologyBoost.toString,
            "instrument" -> m.instrumented.toString)
        case "memory://stats" =>
          // the resource view is the 6-field subset resources.py:38-47
          // publishes (the memory_stats TOOL carries the full set)
          val s = m.stats()
          jobj(
            "total_memories" -> s.totalMemories.toString,
            "semantic_count" -> s.semanticCount.toString,
            "procedural_count" -> s.proceduralCount.toString,
            "episodic_count" -> s.episodicCount.toString,
            "entity_count" -> s.entityCount.toString,
            "relation_count" -> s.relationCount.toString)
        case other => jobj("error" -> js(s"unknown resource: $other"))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        jobj("error" -> js(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
    }

  /** One prompt template's metadata (reference mcp/prompts.py). */
  case class PromptSpec(name: String, description: String,
      params: Seq[(String, String, Boolean)])

  val prompts: Seq[PromptSpec] = Seq(
    PromptSpec("manage_memories",
      "Guide an AI agent through managing memories for a user conversation",
      Seq(("topic", "string", false))),
    PromptSpec("knowledge_capture",
      "Guide an AI agent through extracting and storing knowledge from a document or text",
      Seq(("text", "string", false)))
  )

  /** Render one prompt template (prompts.py:8-59): a numbered workflow
    * over the tool surface, with the optional argument appended as the
    * focus/payload section.
    */
  def prompt(name: String, args: Map[String, String] = Map.empty): String =
    name match {
      case "manage_memories" =>
        val base =
          """You are managing a user's long-term memory system. Follow these steps:
            |
            |1. SEARCH FIRST: before adding anything, run memory_search on the topic
            |   so existing memories are not duplicated.
            |2. ADD NEW MEMORIES: store genuinely new information with memory_add,
            |   choosing the memory_type: "semantic" for facts and biographical
            |   details, "procedural" for instructions and preferences, "episodic"
            |   for interaction events.
            |3. UPDATE EXISTING: correct an outdated memory with memory_update,
            |   passing its memory_id and the new text.
            |4. REVIEW: list the stored state with memory_list to verify it.
            |5. CONSOLIDATE: when many similar memories accumulate, group them into
            |   concise topic summaries with memory_summarize.""".stripMargin
        args.get("topic").filter(_.nonEmpty)
          .map(t => s"$base\n\nFocus on the topic: $t").getOrElse(base)
      case "knowledge_capture" =>
        val base =
          """You are capturing knowledge from text into the memory system. Follow these steps:
            |
            |1. READ the text and identify the key facts, entities, and relationships.
            |2. SEARCH existing memories with memory_search on the key terms to see
            |   what is already stored.
            |3. ADD the new knowledge with memory_add — extraction and reconciliation
            |   run automatically; long texts go through memory_add_batch in chunks.
            |4. VERIFY by searching for the newly added information.
            |5. ORGANIZE: if the store has grown large, consolidate older entries
            |   with memory_summarize.""".stripMargin
        args.get("text").filter(_.nonEmpty)
          .map(t => s"$base\n\nText to capture:\n$t").getOrElse(base)
      case other => s"unknown prompt: $other"
    }

  /** Dispatch one tool call. Args are typed Scala values (the protocol
    * frontend owns deserialization): String, Boolean, Int/Long, Double,
    * Seq[String] where the spec says so.
    */
  def call(name: String, args: Map[String, Any] = Map.empty): String = {
    def str(k: String): Option[String] = args.get(k).map(_.toString)
    def int(k: String, d: Int): Int = args.get(k) match {
      case Some(v: Int) => v
      case Some(v: Long) => v.toInt
      case Some(v) => v.toString.toInt
      case None => d
    }
    def bool(k: String, d: Boolean): Boolean = args.get(k) match {
      case Some(v: Boolean) => v
      case Some(v) => v.toString.toBoolean
      case None => d
    }
    try {
      name match {
        case "memory_add" =>
          val res = m.add(
            str("text").getOrElse(throw new IllegalArgumentException("text required")),
            memoryType = str("memory_type").getOrElse(graft.core.MemoryTypes.Default),
            sessionId = str("session_id"),
            infer = bool("infer", d = true))
          jobj("events" -> jarr(res.events.map(e => jobj(
            "event" -> js(e.event),
            "memory_id" -> jopt(e.memoryId),
            "text" -> js(e.text)))))
        case "memory_add_batch" =>
          val texts = args.get("texts") match {
            case Some(xs: Seq[_]) => xs.map(_.toString)
            case _ => throw new IllegalArgumentException("texts required")
          }
          val ids = m.addBatch(texts,
            memoryType = str("memory_type").getOrElse(graft.core.MemoryTypes.Default))
          jobj("memory_ids" -> jarr(ids.map(js)))
        case "memory_search" =>
          val hits = m.search(
            str("query").getOrElse(throw new IllegalArgumentException("query required")),
            k = int("k", 10),
            memoryType = str("memory_type"),
            minScore = str("min_score").map(_.toDouble),
            pointInTime = str("point_in_time").map(_.toLong))
          jobj("results" -> jarr(hits.map(resultJson)))
        case "memory_update" =>
          jobj("updated" -> m.update(
            str("memory_id").getOrElse(throw new IllegalArgumentException("memory_id required")),
            str("text").getOrElse(throw new IllegalArgumentException("text required"))).toString)
        case "memory_delete" =>
          jobj("deleted" -> m.delete(
            str("memory_id").getOrElse(throw new IllegalArgumentException("memory_id required"))).toString)
        case "memory_delete_all" =>
          jobj("deleted_count" -> m.deleteAll().toString)
        case "memory_list" =>
          jobj("results" -> jarr(m.getAll(str("memory_type")).map(resultJson)))
        case "memory_summarize" =>
          jobj("summary_ids" -> jarr(m.summarize().map(js)))
        case "memory_history" =>
          jobj("history" -> jarr(m.history(
            str("memory_id").getOrElse(throw new IllegalArgumentException("memory_id required")))
            .map(h => jobj(
              "event" -> js(h.event),
              "timestamp" -> h.timestamp.toString,
              "old_text" -> jopt(h.oldText),
              "new_text" -> jopt(h.newText)))))
        case "memory_stats" =>
          val s = m.stats()
          jobj(
            "total_memories" -> s.totalMemories.toString,
            "semantic" -> s.semanticCount.toString,
            "procedural" -> s.proceduralCount.toString,
            "episodic" -> s.episodicCount.toString,
            "entities" -> s.entityCount.toString,
            "relations" -> s.relationCount.toString,
            "episodes" -> s.episodeCount.toString,
            "communities" -> s.communityCount.toString,
            "expired" -> s.expiredCount.toString)
        case "memory_explain_search" =>
          val ex = m.explain(
            str("query").getOrElse(throw new IllegalArgumentException("query required")),
            k = int("k", 10))
          jobj(
            "steps" -> jarr(ex.steps.map(st => jobj(
              "name" -> js(st.name), "detail" -> js(st.detail),
              "count" -> st.count.toString))),
            "results" -> jarr(ex.results.map(resultJson)))
        case other =>
          jobj("error" -> js(s"unknown tool: $other"))
      }
    } catch {
      case scala.util.control.NonFatal(e) =>
        jobj("error" -> js(Option(e.getMessage).getOrElse(e.getClass.getSimpleName)))
    }
  }
}
