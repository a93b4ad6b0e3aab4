package graft.api

/** Minimal JSON writer shared by the CLI and MCP-equivalent tool surface
  * (build.sbt allows no JSON dependency). Writers only — the tool layer
  * takes typed Scala args, so no parser is needed.
  */
private[graft] object Json {
  def js(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
  def jopt(o: Option[String]): String = o.map(js).getOrElse("null")
  def jnum(o: Option[Long]): String = o.map(_.toString).getOrElse("null")
  def jarr(xs: Seq[String]): String = xs.mkString("[", ",", "]")
  def jobj(fields: (String, String)*): String =
    fields.map { case (k, v) => js(k) + ":" + v }.mkString("{", ",", "}")

  /** SearchResult serialization shared by every read surface
    * (mcp/tools.py:16-24 `_serialize`). */
  def resultJson(r: SearchResult): String = jobj(
    "memory_id" -> js(r.memoryId),
    "text" -> js(r.text),
    "score" -> r.score.toString,
    "memory_type" -> js(r.memoryType),
    "source" -> js(r.source),
    "created_at" -> jnum(r.createdAt),
    "session_id" -> jopt(r.sessionId),
    "relations" -> jarr(r.relations.map(t => jobj(
      "source" -> js(t.source), "relation" -> js(t.relation),
      "target" -> js(t.target))))
  )
}
