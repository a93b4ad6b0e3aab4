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
