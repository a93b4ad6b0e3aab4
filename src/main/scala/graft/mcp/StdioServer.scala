package graft.mcp

import java.io.{BufferedReader, InputStream, InputStreamReader, OutputStream,
  PrintWriter}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}

/** MCP stdio transport: a JSON-RPC 2.0 loop over newline-delimited JSON,
  * binding the transport-agnostic [[MemoryTools]] registries to the wire
  * protocol a real MCP client speaks (the reference serves the same
  * surface through FastMCP's stdio transport,
  * mcp/server.py:1-94). Methods: initialize, ping, tools/list,
  * tools/call, resources/list, resources/read, prompts/list,
  * prompts/get; notifications (no id) are consumed without a response.
  *
  * JSON handling uses Jackson (already on the Spark classpath) — no new
  * dependencies. One request is handled at a time in arrival order, which
  * is the MCP stdio contract; the engine's own thread-safety (store
  * synchronization) covers any re-entrant tool work.
  */
final class McpStdioServer(
    tools: MemoryTools,
    serverName: String = "graft-memory",
    serverVersion: String = "0.1.0"
) {
  private val mapper = new ObjectMapper()
  private val ProtocolVersion = "2024-11-05"

  /** Handle one raw JSON-RPC frame; None = notification (no response). */
  def handle(line: String): Option[String] = {
    val req =
      try mapper.readTree(line)
      catch {
        case _: Exception =>
          return Some(mapper.writeValueAsString(
            error(mapper.nullNode(), -32700, "parse error")))
      }
    val id = if (req.has("id")) req.get("id") else null
    val method = Option(req.get("method")).map(_.asText()).getOrElse("")
    val params = Option(req.get("params")).getOrElse(mapper.createObjectNode())
    if (id == null) { // notification (notifications/initialized, cancels)
      None
    } else {
      val resp =
        try dispatch(method, params) match {
          case Some(result) => success(id, result)
          case None => error(id, -32601, s"method not found: $method")
        } catch {
          case e: McpInvalidParams => error(id, -32602, e.getMessage)
          case scala.util.control.NonFatal(e) =>
            error(id, -32603,
              Option(e.getMessage).getOrElse(e.getClass.getSimpleName))
        }
      Some(mapper.writeValueAsString(resp))
    }
  }

  /** Blocking serve loop: one line in, at most one line out, until EOF. */
  def serve(in: InputStream, out: OutputStream): Unit = {
    val reader = new BufferedReader(
      new InputStreamReader(in, StandardCharsets.UTF_8))
    val writer = new PrintWriter(
      new java.io.OutputStreamWriter(out, StandardCharsets.UTF_8), false)
    var line = reader.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) handle(line).foreach { resp =>
        writer.println(resp)
        writer.flush()
      }
      line = reader.readLine()
    }
  }

  private final class McpInvalidParams(msg: String) extends RuntimeException(msg)
  private def requireParam(params: JsonNode, name: String): JsonNode = {
    val v = params.get(name)
    if (v == null || v.isNull) throw new McpInvalidParams(s"$name required")
    v
  }

  private def dispatch(method: String, params: JsonNode): Option[ObjectNode] =
    method match {
      case "initialize" =>
        val r = mapper.createObjectNode()
        r.put("protocolVersion", ProtocolVersion)
        val caps = r.putObject("capabilities")
        caps.putObject("tools")
        caps.putObject("resources")
        caps.putObject("prompts")
        val info = r.putObject("serverInfo")
        info.put("name", serverName)
        info.put("version", serverVersion)
        Some(r)
      case "ping" =>
        Some(mapper.createObjectNode())
      case "tools/list" =>
        val r = mapper.createObjectNode()
        val arr = r.putArray("tools")
        tools.describe.foreach { t => arr.add(toolNode(t)) }
        Some(r)
      case "tools/call" =>
        val name = requireParam(params, "name").asText()
        val args = Option(params.get("arguments"))
          .filter(_.isObject).map(argMap).getOrElse(Map.empty[String, Any])
        val payload = tools.call(name, args)
        val parsed = mapper.readTree(payload)
        val r = mapper.createObjectNode()
        val content = r.putArray("content")
        val item = content.addObject()
        item.put("type", "text")
        item.put("text", payload)
        r.put("isError", parsed.isObject && parsed.has("error"))
        Some(r)
      case "resources/list" =>
        val r = mapper.createObjectNode()
        val arr = r.putArray("resources")
        tools.resources.foreach { res =>
          val n = arr.addObject()
          n.put("uri", res.uri)
          n.put("name", res.uri.stripPrefix("memory://"))
          n.put("description", res.description)
          n.put("mimeType", "application/json")
        }
        Some(r)
      case "resources/read" =>
        val uri = requireParam(params, "uri").asText()
        val r = mapper.createObjectNode()
        val contents = r.putArray("contents")
        val item = contents.addObject()
        item.put("uri", uri)
        item.put("mimeType", "application/json")
        item.put("text", tools.readResource(uri))
        Some(r)
      case "prompts/list" =>
        val r = mapper.createObjectNode()
        val arr = r.putArray("prompts")
        tools.prompts.foreach { p =>
          val n = arr.addObject()
          n.put("name", p.name)
          n.put("description", p.description)
          val pargs = n.putArray("arguments")
          p.params.foreach { case (pn, _, req) =>
            val a = pargs.addObject()
            a.put("name", pn)
            a.put("required", req)
          }
        }
        Some(r)
      case "prompts/get" =>
        val name = requireParam(params, "name").asText()
        val args = Option(params.get("arguments")).filter(_.isObject)
          .map(n => argMap(n).map { case (k, v) => k -> v.toString })
          .getOrElse(Map.empty[String, String])
        val text = tools.prompt(name, args)
        val r = mapper.createObjectNode()
        r.put("description",
          tools.prompts.find(_.name == name).map(_.description).getOrElse(name))
        val msgs = r.putArray("messages")
        val msg = msgs.addObject()
        msg.put("role", "user")
        val c = msg.putObject("content")
        c.put("type", "text")
        c.put("text", text)
        Some(r)
      case _ => None
    }

  /** JSON Schema for one tool, from the registry's (name, type, required)
    * triples.
    */
  private def toolNode(t: tools.ToolSpec): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("name", t.name)
    n.put("description", t.description)
    val schema = n.putObject("inputSchema")
    schema.put("type", "object")
    val props = schema.putObject("properties")
    val required = mapper.createArrayNode()
    t.params.foreach { case (pn, ptype, preq) =>
      val p = props.putObject(pn)
      ptype match {
        case "array<string>" =>
          p.put("type", "array")
          p.putObject("items").put("type", "string")
        case other => p.put("type", other)
      }
      if (preq) required.add(pn)
    }
    if (!required.isEmpty) schema.set[ObjectNode]("required", required)
    n
  }

  /** JSON arguments -> the typed Scala values MemoryTools.call expects. */
  private def argMap(node: JsonNode): Map[String, Any] = {
    import scala.jdk.CollectionConverters._
    node.properties().asScala.map { e =>
      val v: Any = e.getValue match {
        case b if b.isBoolean => b.asBoolean()
        case i if i.isIntegralNumber => i.asLong()
        case d if d.isNumber => d.asDouble()
        case a: ArrayNode => a.asScala.map(_.asText()).toSeq
        case s => s.asText()
      }
      e.getKey -> v
    }.toMap
  }

  private def success(id: JsonNode, result: ObjectNode): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("jsonrpc", "2.0")
    n.set[ObjectNode]("id", id)
    n.set[ObjectNode]("result", result)
    n
  }

  private def error(id: JsonNode, code: Int, message: String): ObjectNode = {
    val n = mapper.createObjectNode()
    n.put("jsonrpc", "2.0")
    n.set[ObjectNode]("id", if (id == null) mapper.nullNode() else id)
    val e = n.putObject("error")
    e.put("code", code)
    e.put("message", message)
    n
  }
}

/** `runMain graft.mcp.McpStdioMain` — a connectable MCP server over the
  * in-session engine (mirrors the reference entry point's env contract:
  * GRAFT_MCP_USER scope; deterministic MockEmbedder stands in for the
  * network embedding providers the reference wires up, which a
  * zero-egress deployment cannot reach).
  */
object McpStdioMain {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val m = new graft.api.MemoryManager(
      spark,
      graft.api.MemoryConfig(
        userId = sys.env.getOrElse("GRAFT_MCP_USER", "default")),
      new graft.core.GraphStore(spark),
      new graft.ext.MockEmbedder(16),
      new graft.ext.HeuristicExtractor,
      new graft.ext.AddAllReconciler)
    new McpStdioServer(new MemoryTools(m)).serve(System.in, System.out)
    spark.stop()
  }
}
