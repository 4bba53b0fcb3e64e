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

  test("init without a manifest exits 1; stats without an index exits 1") {
    val empty = Files.createTempDirectory("graft_cli_empty")
    assert(capture("init", empty.toString)._1 == 1)
    assert(capture("stats", empty.toString)._1 == 1)
    assert(capture("frobnicate")._1 == 2)
  }
}
