package graft.serve

import java.io.{BufferedReader, PrintStream}

import graft.api.Engine
import graft.util.{Json, JsonParse}

/** MCP wire framing over stdio — the transport the reference's
  * `ariadne serve` actually speaks (`/root/reference/src/ariadne_dbt/
  * server.py:26-52` builds a FastMCP stdio server; `cli.py:154-161`
  * runs it). The framing is JSON-RPC 2.0 with the public
  * Model Context Protocol methods, one message per line:
  *
  *   initialize                 → protocolVersion/capabilities/serverInfo
  *   notifications/initialized  → (notification — no response)
  *   ping                       → {}
  *   tools/list                 → the 10-tool catalog with JSON-Schema
  *                                input schemas
  *   tools/call {name,arguments}→ result.content[{type:"text",text}] —
  *                                tool results render as JSON text;
  *                                tool-level failures come back as
  *                                isError:true results (the MCP
  *                                convention), protocol-level failures
  *                                as JSON-RPC error objects (-32700
  *                                parse / -32600 invalid / -32601
  *                                unknown method / -32602 bad params
  *                                or unknown tool name).
  *
  * Tool semantics and argument names are EXACTLY
  * [[JsonLineServer.dispatch]] — this object adds framing only, so the
  * two transports can never diverge. Zero dependencies by design (the
  * JSON-lines transport remains the default; `serve --mcp` selects
  * this one).
  */
object McpServer {

  /** Protocol revision this server implements (public MCP spec id). */
  val ProtocolVersion = "2024-11-05"

  def loop(engine: Engine, in: BufferedReader, out: PrintStream): Int = {
    var line = in.readLine()
    while (line != null) {
      if (line.trim.nonEmpty) handle(engine, line).foreach(out.println)
      line = in.readLine()
    }
    0
  }

  /** One inbound line → optional outbound line (notifications and
    * unknown notifications produce nothing). */
  def handle(engine: Engine, line: String): Option[String] = {
    val parsed =
      try JsonParse.parse(line)
      catch { case e: Exception =>
        return Some(errorJson(null, -32700, s"parse error: ${e.getMessage}"))
      }
    val req = parsed match {
      case m: scala.collection.Map[_, _] =>
        m.map { case (k, v) => k.toString -> v }.toMap
      case _ => return Some(errorJson(null, -32600, "request must be a JSON object"))
    }
    val id = req.get("id").orNull
    val hasId = req.contains("id")

    req.get("method") match {
      case Some("initialize") =>
        Some(resultJson(id, Map(
          "protocolVersion" -> ProtocolVersion,
          "capabilities" -> Map("tools" -> Map.empty[String, Any]),
          "serverInfo" -> Map("name" -> "graft", "version" -> "0.8"))))
      case Some("notifications/initialized") => None
      case Some("ping") => Some(resultJson(id, Map.empty[String, Any]))
      case Some("tools/list") =>
        Some(resultJson(id, Map("tools" -> toolSchemas)))
      case Some("tools/call") =>
        val params = req.get("params") match {
          case Some(m: scala.collection.Map[_, _]) =>
            m.map { case (k, v) => k.toString -> v }.toMap
          case _ => return Some(errorJson(id, -32602, "params must be an object"))
        }
        val name = params.get("name") match {
          case Some(s: String) => s
          case _ => return Some(errorJson(id, -32602, "params.name must be a string"))
        }
        // Unknown tool NAME is a protocol error (-32602 per the MCP
        // 2024-11-05 spec), not an isError tool result — isError is
        // reserved for failures INSIDE a known tool's execution.
        if (!JsonLineServer.toolNames.contains(name))
          return Some(errorJson(id, -32602, s"Unknown tool: $name"))
        val args = params.getOrElse("arguments", Map.empty[String, Any])
        try {
          val r = JsonLineServer.dispatch(engine, Map("tool" -> name, "args" -> args))
          Some(resultJson(id, Map(
            "content" -> Seq(Map("type" -> "text", "text" -> Json.render(r))),
            "isError" -> false)))
        } catch { case e: Exception =>
          // Tool-level failure: an isError RESULT, not a protocol error
          // (the caller's request was well-formed MCP).
          Some(resultJson(id, Map(
            "content" -> Seq(Map("type" -> "text",
              "text" -> s"${e.getClass.getSimpleName}: ${e.getMessage}")),
            "isError" -> true)))
        }
      case Some(other: String) if hasId =>
        Some(errorJson(id, -32601, s"method not found: $other"))
      case Some(_) if hasId =>
        // Non-string method on an id-bearing request: JSON-RPC 2.0
        // requires an Invalid Request response, not a silent drop.
        Some(errorJson(id, -32600, "method must be a string"))
      case Some(_) => None // unknown notification: ignored per JSON-RPC 2.0
      case None => Some(errorJson(id, -32600, "missing method"))
    }
  }

  private def resultJson(id: Any, result: Any): String =
    Json.render(scala.collection.immutable.ListMap(
      "jsonrpc" -> "2.0", "id" -> id, "result" -> result))

  private def errorJson(id: Any, code: Int, message: String): String =
    Json.render(scala.collection.immutable.ListMap(
      "jsonrpc" -> "2.0", "id" -> id,
      "error" -> Map("code" -> code, "message" -> message)))

  // ── tools/list catalog ──────────────────────────────────────────────

  private def schema(required: Seq[String], props: (String, Map[String, Any])*) =
    Map("type" -> "object",
      "properties" -> scala.collection.immutable.ListMap(props: _*),
      "required" -> required)
  private val S = Map[String, Any]("type" -> "string")
  private val I = Map[String, Any]("type" -> "integer")
  private def SA = Map[String, Any]("type" -> "array", "items" -> S)

  /** The 10-tool catalog — names/args are the [[JsonLineServer]]
    * contract, descriptions summarize the reference's tool docstrings
    * (`server.py:54-527`). */
  val toolSchemas: Seq[Map[String, Any]] = Seq(
    Map("name" -> "get_context_capsule",
      "description" -> ("THE primary tool: a pre-filtered, token-budgeted " +
        "context package (pivots + upstream/downstream + tests/macros/sources " +
        "+ patterns) for a dbt task."),
      "inputSchema" -> schema(Seq("task"),
        "task" -> S, "focus_model" -> S, "entry_models" -> SA,
        "entry_paths" -> SA, "token_budget" -> I)),
    Map("name" -> "discover_models",
      "description" -> ("Broad, cheap model discovery - up to `limit` model " +
        "names with layers/paths/relationship to the task; call before " +
        "get_context_capsule."),
      "inputSchema" -> schema(Seq("task"),
        "task" -> S, "focus_model" -> S, "entry_models" -> SA,
        "entry_paths" -> SA, "limit" -> I)),
    Map("name" -> "get_model_details",
      "description" -> "Full details for a single model (SQL, columns, tests, refs).",
      "inputSchema" -> schema(Seq("model_name"), "model_name" -> S)),
    Map("name" -> "get_lineage",
      "description" -> "DAG lineage for a model, bounded upstream/downstream depth.",
      "inputSchema" -> schema(Seq("model_id"),
        "model_id" -> S, "up_depth" -> I, "down_depth" -> I)),
    Map("name" -> "get_impact_analysis",
      "description" -> "Blast radius before changing a model: affected downstream models and risk.",
      "inputSchema" -> schema(Seq("model_id"), "model_id" -> S, "depth" -> I)),
    Map("name" -> "search_models",
      "description" -> ("Hybrid model search (BM25 + centrality re-rank) over " +
        "names/descriptions/columns/SQL."),
      "inputSchema" -> schema(Seq("query"),
        "query" -> S, "limit" -> I, "intent" -> S, "layer" -> S)),
    Map("name" -> "find_models_by_column",
      "description" -> "Models exposing a column name (exact or LIKE pattern).",
      "inputSchema" -> schema(Seq("column_name"), "column_name" -> S, "limit" -> I)),
    Map("name" -> "find_models_by_path",
      "description" -> "Models whose file path matches a LIKE pattern.",
      "inputSchema" -> schema(Seq("path_pattern"), "path_pattern" -> S, "limit" -> I)),
    Map("name" -> "refresh_index",
      "description" -> "Re-index after dbt compile.",
      "inputSchema" -> schema(Nil)),
    Map("name" -> "rate_capsule",
      "description" -> "Rate the most recent capsule (1-5) to improve future context.",
      "inputSchema" -> schema(Seq("rating"), "rating" -> I, "notes" -> S)))
}
