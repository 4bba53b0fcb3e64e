package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

import graft.serve.McpServer
import graft.util.JsonParse

/** MCP stdio framing (`serve --mcp`): JSON-RPC 2.0 handshake,
  * tools/list catalog parity with the JSON-lines transport, tools/call
  * content framing, and the protocol-vs-tool error split. The tool
  * SEMANTICS are JsonLineServer.dispatch's (covered by CliSpec /
  * ServeParitySpec) — this spec pins the framing only. */
class McpSpec extends SparkSuite {

  private def serveMcp(requests: Seq[String]): Vector[Map[String, Any]] = {
    val root = Files.createTempDirectory("graft_mcp")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
    val buf = new ByteArrayOutputStream()
    val code = Cli.run(spark, Seq("serve", root.toString, "--mcp"),
      new PrintStream(buf, true),
      new java.io.BufferedReader(new java.io.StringReader(requests.mkString("\n"))))
    assert(code == 0, buf.toString)
    buf.toString.linesIterator.toVector
      .map(l => JsonParse.parse(l).asInstanceOf[Map[String, Any]])
  }

  test("initialize -> initialized -> tools/list -> tools/call round-trip") {
    val responses = serveMcp(Seq(
      """{"jsonrpc":"2.0","id":1,"method":"initialize","params":{"protocolVersion":"2024-11-05","capabilities":{},"clientInfo":{"name":"spec","version":"0"}}}""",
      """{"jsonrpc":"2.0","method":"notifications/initialized"}""",
      """{"jsonrpc":"2.0","id":2,"method":"tools/list"}""",
      """{"jsonrpc":"2.0","id":3,"method":"tools/call","params":{"name":"search_models","arguments":{"query":"orders","limit":5}}}""",
      """{"jsonrpc":"2.0","id":4,"method":"ping"}"""))
    // the notification produced no response line
    assert(responses.size == 4)
    assert(responses.forall(_("jsonrpc") == "2.0"))

    val init = responses(0)("result").asInstanceOf[Map[String, Any]]
    assert(init("protocolVersion") == McpServer.ProtocolVersion)
    assert(init("serverInfo").asInstanceOf[Map[String, Any]]("name") == "graft")
    assert(init("capabilities").asInstanceOf[Map[String, Any]].contains("tools"))

    val tools = responses(1)("result").asInstanceOf[Map[String, Any]]("tools")
      .asInstanceOf[List[Map[String, Any]]]
    assert(tools.map(_("name")) == graft.serve.JsonLineServer.toolNames.toList,
      "tools/list must carry exactly the JSON-lines transport's 10 tools, same order")
    tools.foreach { t =>
      val s = t("inputSchema").asInstanceOf[Map[String, Any]]
      assert(s("type") == "object" && s.contains("properties") && s.contains("required"),
        s"tool ${t("name")} needs a JSON-Schema inputSchema")
    }

    val call = responses(2)("result").asInstanceOf[Map[String, Any]]
    assert(call("isError") == false)
    val content = call("content").asInstanceOf[List[Map[String, Any]]]
    assert(content.head("type") == "text")
    assert(content.head("text").toString.contains("fct_orders"),
      "search result text must surface the fixture's order model")

    assert(responses(3)("id") == 4L && responses(3).contains("result"))
  }

  test("protocol errors are JSON-RPC errors; tool failures are isError results") {
    val responses = serveMcp(Seq(
      """this is not json""",
      """{"jsonrpc":"2.0","id":7,"method":"no/such/method"}""",
      """{"jsonrpc":"2.0","id":8,"method":"tools/call","params":{"name":"no_such_tool","arguments":{}}}""",
      """{"jsonrpc":"2.0","id":9,"method":"tools/call","params":{"name":"get_model_details","arguments":{"model_name":"nope_not_there"}}}""",
      """{"jsonrpc":"2.0","id":10,"method":42}"""))
    assert(responses.size == 5)
    val parseErr = responses(0)("error").asInstanceOf[Map[String, Any]]
    assert(parseErr("code") == -32700L)
    val unknownMethod = responses(1)("error").asInstanceOf[Map[String, Any]]
    assert(unknownMethod("code") == -32601L && responses(1)("id") == 7L)
    // an UNKNOWN TOOL NAME is a protocol error (-32602, MCP 2024-11-05)
    val unknownTool = responses(2)("error").asInstanceOf[Map[String, Any]]
    assert(unknownTool("code") == -32602L && responses(2)("id") == 8L)
    assert(unknownTool("message").toString.contains("Unknown tool"))
    // a well-formed call to a KNOWN tool that fails is a RESULT with isError
    val toolFail = responses(3)
    assert(!toolFail.contains("error"), s"tool failure must not be a protocol error: $toolFail")
    assert(toolFail("result").asInstanceOf[Map[String, Any]]("isError") == true)
    // a non-string method carrying an id is Invalid Request, not a silent drop
    val badMethod = responses(4)("error").asInstanceOf[Map[String, Any]]
    assert(badMethod("code") == -32600L && responses(4)("id") == 10L)
  }

  test("tools/call answers match the JSON-lines transport verbatim") {
    val root = Files.createTempDirectory("graft_mcp_parity")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))
    def run(args: Seq[String], reqs: Seq[String]): Vector[String] = {
      val buf = new ByteArrayOutputStream()
      Cli.run(spark, args, new PrintStream(buf, true),
        new java.io.BufferedReader(new java.io.StringReader(reqs.mkString("\n"))))
      buf.toString.linesIterator.toVector
    }
    val viaMcp = run(Seq("serve", root.toString, "--mcp"), Seq(
      """{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"get_lineage","arguments":{"model_id":"model.shoply.fct_orders"}}}"""))
    val viaLines = run(Seq("serve", root.toString), Seq(
      """{"tool":"get_lineage","args":{"model_id":"model.shoply.fct_orders"}}""", "exit"))
    val mcpText = JsonParse.parse(viaMcp.head).asInstanceOf[Map[String, Any]]("result")
      .asInstanceOf[Map[String, Any]]("content")
      .asInstanceOf[List[Map[String, Any]]].head("text").toString
    val linesResult = JsonParse.parse(viaLines(1)).asInstanceOf[Map[String, Any]]("result")
    assert(JsonParse.parse(mcpText) == linesResult,
      "the MCP content text must be the JSON-lines result, rendered")
  }
}
