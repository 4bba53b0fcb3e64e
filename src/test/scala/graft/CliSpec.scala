package graft

import java.io.{ByteArrayOutputStream, PrintStream}
import java.nio.file.Files

/** CLI verbs (mirrors cli.py behavior): init indexes + generates,
  * stats reads the written index, errors use non-zero exit codes. */
class CliSpec extends SparkSuite {

  private def capture(args: String*): (Int, String) = {
    val buf = new ByteArrayOutputStream()
    val code = Cli.run(spark, args.toSeq, new PrintStream(buf, true))
    (code, buf.toString)
  }

  test("init indexes the fixture project and renders context files") {
    val root = Files.createTempDirectory("graft_cli")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))

    val (code, outText) = capture("init", root.toString, "--target=cursor")
    assert(code == 0, outText)
    assert(outText.contains("Indexed 6 models"))
    assert(outText.contains("enriched from catalog.json"))
    assert(outText.contains("enriched from run_results.json"))
    assert(Files.exists(root.resolve(".graft/index/models")))
    assert(Files.exists(root.resolve(".claude/CLAUDE.md")))
    assert(Files.exists(root.resolve(".cursor/rules/ariadne.mdc")))

    val (statsCode, statsOut) = capture("stats", root.toString)
    assert(statsCode == 0)
    assert(statsOut.contains("shoply"))
    assert(statsOut.contains("Total models"))
  }

  test("serve answers one JSON-lines round-trip per tool verb") {
    import graft.util.JsonParse
    val root = Files.createTempDirectory("graft_serve")
    Files.createDirectories(root.resolve("target"))
    for (f <- Seq("manifest.json", "catalog.json", "run_results.json"))
      Files.copy(java.nio.file.Paths.get(fixturePath(f)), root.resolve(s"target/$f"))

    val requests = Seq(
      """{"tool": "get_context_capsule", "args": {"task": "debug fct_orders totals"}}""",
      """{"tool": "discover_models", "args": {"task": "orders", "limit": 5}}""",
      """{"tool": "get_model_details", "args": {"model_name": "fct_orders"}}""",
      """{"tool": "get_lineage", "args": {"model_id": "model.shoply.fct_orders"}}""",
      """{"tool": "get_impact_analysis", "args": {"model_id": "model.shoply.stg_orders"}}""",
      """{"tool": "search_models", "args": {"query": "orders", "limit": 5}}""",
      """{"tool": "find_models_by_column", "args": {"column_name": "customer_id"}}""",
      """{"tool": "find_models_by_path", "args": {"path_pattern": "%stg%"}}""",
      """{"tool": "refresh_index"}""",
      """{"tool": "rate_capsule", "args": {"rating": 5, "notes": "good"}}""",
      """{"tool": "no_such_tool"}""",
      """not json at all""",
      "exit")
    val buf = new ByteArrayOutputStream()
    val code = Cli.run(spark, Seq("serve", root.toString),
      new PrintStream(buf, true),
      new java.io.BufferedReader(new java.io.StringReader(requests.mkString("\n"))))
    assert(code == 0, buf.toString)

    val lines = buf.toString.linesIterator.toVector
    assert(lines.size == requests.size, s"one response per request:\n${buf}")
    val ready = JsonParse.parse(lines.head).asInstanceOf[Map[String, Any]]
    assert(ready("status") == "ready")

    val responses = lines.tail.map(l => JsonParse.parse(l).asInstanceOf[Map[String, Any]])
    // the 10 tool calls succeed...
    responses.take(10).zip(requests).foreach { case (r, req) =>
      assert(r.contains("result") && !r.contains("error"), s"$req -> $r")
    }
    // ...with sane payloads where easy to pin down
    val search = responses(5)("result").asInstanceOf[List[Map[String, Any]]]
    assert(search.nonEmpty && search.exists(_.values.exists(
      v => v != null && v.toString.contains("fct_orders"))))
    val lineage = responses(3)("result").asInstanceOf[List[Map[String, Any]]]
    assert(lineage.nonEmpty)
    assert(responses(9)("result").asInstanceOf[Map[String, Any]]("log_id") != null)
    // unknown tool and parse failure answer with an error, not a crash
    assert(responses(10).contains("error"))
    assert(responses(11).contains("error"))
  }

  test("garbage numeric flag values exit 2 with usage, not a stack trace") {
    val (sseCode, sseOut) = capture("serve", "--sse=notaport")
    assert(sseCode == 2, sseOut)
    assert(sseOut.contains("usage:"), sseOut)
    val (daysCode, daysOut) = capture("usage", "--days=soon")
    assert(daysCode == 2, daysOut)
    assert(daysOut.contains("usage:"), daysOut)
    // out-of-range ports are the same failure class as non-numeric ones
    val (rangeCode, rangeOut) = capture("serve", "--sse=70000")
    assert(rangeCode == 2 && rangeOut.contains("usage:"), rangeOut)
  }

  test("init without a manifest exits 1; stats without an index exits 1") {
    val empty = Files.createTempDirectory("graft_cli_empty")
    assert(capture("init", empty.toString)._1 == 1)
    assert(capture("stats", empty.toString)._1 == 1)
    assert(capture("frobnicate")._1 == 2)
  }
}
