package graft

import java.nio.file.Files

import graft.generate.ContextGenerator

/** Generated-artifact surface (mirrors tests/test_generator.py): all
  * five claude_code artifacts plus cursor/windsurf rules exist for the
  * fixture project and carry project tokens; memory.md is
  * create-if-absent. */
class GeneratorSpec extends SparkSuite {

  private lazy val gen = new ContextGenerator(SparkSuite.catalog)

  test("claude_code target renders CLAUDE.md with project tokens and key models") {
    val root = Files.createTempDirectory("graft_gen")
    val written = gen.generateAll(root, Seq("claude_code"))
    assert(written.nonEmpty)
    val claudeMd = root.resolve(".claude/CLAUDE.md")
    assert(Files.exists(claudeMd))
    val content = Files.readString(claudeMd)
    assert(content.contains("shoply"))
    assert(content.contains("get_context_capsule"))
    assert(content.contains("fct_orders") || content.contains("dim_customers"),
      "most connected model should appear")
  }

  test("skills and dag summary artifacts render") {
    val root = Files.createTempDirectory("graft_gen")
    gen.generateAll(root, Seq("claude_code"))
    val newModel = Files.readString(root.resolve(".claude/skills/new_model.md"))
    assert(newModel.toLowerCase.contains("naming"))
    assert(newModel.contains("stg_"), "staging pattern token")
    val debugTest = Files.readString(root.resolve(".claude/skills/debug_test.md"))
    assert(debugTest.toLowerCase.contains("debug"))
    val dag = Files.readString(root.resolve(".claude/context/dag_summary.md"))
    assert(dag.contains("shoply"))
  }

  test("memory.md created once, never overwritten") {
    val root = Files.createTempDirectory("graft_gen")
    gen.generateAll(root, Seq("claude_code"))
    val memory = root.resolve(".claude/memory.md")
    assert(Files.exists(memory))
    Files.writeString(memory, "# Custom content\nDo not overwrite me.")
    gen.generateAll(root, Seq("claude_code"))
    assert(Files.readString(memory).contains("Custom content"))
  }

  test("cursor + windsurf rules render from the shared template") {
    val root = Files.createTempDirectory("graft_gen")
    val written = gen.generateAll(root, Seq("claude_code", "cursor", "windsurf"))
    val paths = written.map(_.toString)
    assert(paths.exists(_.contains(".claude")))
    assert(paths.exists(_.contains(".cursor")))
    assert(paths.exists(_.contains(".windsurf")))
    val rules = Files.readString(root.resolve(".cursor/rules/ariadne.mdc"))
    assert(rules.toLowerCase.contains("dbt"))
    assert(rules.contains("shoply"))
    assert(Files.readString(root.resolve(".windsurf/rules/ariadne.md")) == rules,
      "windsurf uses the same rendered rules")
  }

  test("example yaml in new_model reflects the fixture's tested columns") {
    val yamlSection = gen.skillNewModel()
    assert(yamlSection.contains("not_null"), "fixture has not_null tests")
  }
}
