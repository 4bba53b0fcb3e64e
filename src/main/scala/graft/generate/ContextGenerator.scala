package graft.generate

import java.nio.file.{Files, Path}

import graft.model.Catalog
import graft.serve.ModelInfo

/** Generated-artifact surface (S11) — the context files the reference
  * renders on every `init`/`sync`
  * (`/root/reference/src/ariadne_dbt/generator.py:36-160` and the
  * `.j2` templates directory): CLAUDE.md, memory.md (create-if-absent),
  * skills/new_model.md, skills/debug_test.md, context/dag_summary.md,
  * and the cursor/windsurf rule files.
  *
  * All inputs come from the serving snapshot (bounded catalog
  * metadata); rendering is plain Scala string templating — the template
  * ENGINE is not part of the queryable surface, the rendered artifacts
  * are the contract (`tests/test_generator.py`).
  */
class ContextGenerator(catalog: Catalog) {

  private def snap = catalog.snapshot

  // ── Stats + patterns (patterns.py:20-68,161-224) ────────────────────

  private lazy val meta: Map[String, String] = catalog.metadata.collect()
    .map(r => r.getString(0) -> Option(r.getString(1)).getOrElse("")).toMap

  private def projectName: String = meta.getOrElse("project_name", "")
  private def adapterType: String = meta.getOrElse("adapter_type", "")

  private def layerCount(layer: String): Int = snap.models.count(_.layer == layer)

  private lazy val totalColumns: Int = snap.columnsByModel.values.map(_.size).sum
  private lazy val testedColumns: Int = snap.testsByModel.iterator
    .flatMap { case (mid, ts) => ts.filter(_.columnName.nonEmpty).map(t => (mid, t.columnName)) }
    .toSet.size
  private def coveragePct: Long =
    if (totalColumns == 0) 0L
    else math.round(testedColumns.toDouble / totalColumns * 100)

  private def sourceSchemaCount: Int = snap.sources.values.map(_.sourceName).toSet.size
  private def testCount: Int = snap.testsByModel.values.map(_.size).sum
  private def projectMacroCount: Int = snap.macros.count(_.packageName == projectName)
  private lazy val exposureCount: Long = catalog.exposures.count()

  /** Naming-pattern inference (patterns.py:161-224); defaults are the
    * reference's NamingPatterns model (models.py:212-223). */
  private object naming {
    private val staging = snap.models.filter(_.layer == "staging").map(_.name).sorted
    private val intermediate = snap.models.filter(_.layer == "intermediate").map(_.name)
    private val marts = snap.models.filter(_.layer == "marts").map(_.name)

    val stagingExample: String = staging.headOption.getOrElse("")
    val stagingPattern: String =
      if (staging.isEmpty) "stg_{source}__{entity}"
      else if (stagingExample.contains("__")) "stg_{source}__{entity}"
      else "stg_{source}_{entity}"
    val intermediatePattern: String = "int_{entity}_{verb}"
    val martsPattern: String = {
      val hasFct = marts.exists(_.startsWith("fct_"))
      val hasDim = marts.exists(_.startsWith("dim_"))
      if (hasFct && hasDim) "fct_{entity} | dim_{entity}"
      else if (hasFct) "fct_{entity}"
      else if (hasDim) "dim_{entity}"
      else "fct_{entity} | dim_{entity}"
    }

    private def matOf(layer: String): Option[String] = {
      val ms = snap.models.filter(_.layer == layer)
      if (ms.isEmpty) None
      else Some(ms.groupBy(_.materialization).toSeq
        .minBy { case (mat, xs) => (-xs.size, Option(mat).getOrElse("")) }._1)
    }
    val stagingMaterialization: String = matOf("staging").getOrElse("view")
    val intermediateMaterialization: String = matOf("intermediate").getOrElse("view")
    val martsMaterialization: String = matOf("marts").getOrElse("table")

    val yamlPattern = "__{folder_name}_models.yml"
    val namingSummary =
      s"staging: $stagingPattern, intermediate: $intermediatePattern, marts: $martsPattern"
    val yamlRequirements =
      "Each model needs description + column descriptions + not_null/unique on PK"
  }

  /** Top-8 models by connectivity (generator.py:148-160). */
  private def keyModels(limit: Int = 8): Seq[ModelInfo] =
    snap.models.sortBy(m => (-m.centrality, -m.downstreamCount, m.uniqueId)).take(limit)

  /** Common tags, count desc (patterns.py:268-279). */
  private def commonTags(k: Int = 10): Seq[String] =
    snap.models.flatMap(_.tags).groupBy(identity).toSeq
      .sortBy { case (t, xs) => (-xs.size, t) }.take(k).map(_._1)

  /** Representative well-documented model per layer (patterns.py:72-87). */
  private def exampleModel(layer: String): Option[ModelInfo] = {
    val ms = snap.models.filter(_.layer == layer)
    if (ms.isEmpty) None
    else Some(ms.minBy(m => (
      -snap.columnsByModel.getOrElse(m.uniqueId, Vector.empty).size,
      -Option(m.description).getOrElse("").length, m.uniqueId)))
  }

  /** Example YAML test snippet from the best-tested model
    * (patterns.py:88-120). */
  private def exampleTestYaml(): String = {
    val candidates = snap.models.flatMap { m =>
      val colTests = snap.testsByModel.getOrElse(m.uniqueId, Vector.empty)
        .filter(_.columnName.nonEmpty)
      if (colTests.isEmpty) None
      else Some((m, colTests.map(_.testType).distinct.size, colTests))
    }
    if (candidates.isEmpty) return ""
    val (m, _, colTests) = candidates.maxBy { case (mm, n, _) => (n, mm.uniqueId) }
    val lines = Seq("models:", s"  - name: ${m.name}", "    columns:") ++
      colTests.groupBy(_.columnName).toSeq.sortBy(_._1).take(3).flatMap { case (cn, ts) =>
        Seq(s"      - name: $cn", "        tests:") ++
          ts.map(_.testType).distinct.sorted.map(t => s"          - $t")
      }
    lines.mkString("\n")
  }

  private def nowUtc: String =
    java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm 'UTC'")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())

  // ── Public API (generator.py:39-63) ─────────────────────────────────

  /** Generate all context files; returns the written paths. */
  def generateAll(projectRoot: Path, targets: Seq[String] = Seq("claude_code")): Seq[Path] = {
    val written = Seq.newBuilder[Path]
    if (targets.contains("claude_code")) {
      val claudeDir = projectRoot.resolve(".claude")
      written += write(claudeDir.resolve("CLAUDE.md"), claudeMd())
      val memory = claudeDir.resolve("memory.md")
      if (!Files.exists(memory)) written += write(memory, initialMemoryMd())
      written += write(claudeDir.resolve("skills/new_model.md"), skillNewModel())
      written += write(claudeDir.resolve("skills/debug_test.md"), skillDebugTest())
      written += write(claudeDir.resolve("context/dag_summary.md"), dagSummary())
    }
    if (targets.contains("cursor"))
      written += write(projectRoot.resolve(".cursor/rules/ariadne.mdc"), cursorRules())
    if (targets.contains("windsurf"))
      written += write(projectRoot.resolve(".windsurf/rules/ariadne.md"), cursorRules())
    written.result()
  }

  private def write(p: Path, content: String): Path = {
    Files.createDirectories(p.getParent)
    Files.writeString(p, content)
    p
  }

  // ── Renderers (templates/*.j2) ──────────────────────────────────────

  private def orUnknown(s: String, fallback: String): String =
    if (s.nonEmpty) s else fallback

  private def keyModelBullets: String = keyModels().map { m =>
    val d = Option(m.description).getOrElse("")
    val desc = if (d.isEmpty) "no description"
      else if (d.length > 80) d.take(80) + "..." else d
    s"- **${m.name}** (${m.layerOrOther}): $desc " +
      s"[${m.upstreamCount} upstream, ${m.downstreamCount} downstream]"
  }.mkString("\n")

  /** templates/claude_md.j2 */
  def claudeMd(): String = {
    val other = if (layerCount("other") > 0) s", ${layerCount("other")} other" else ""
    val stagingEx = if (naming.stagingExample.nonEmpty)
      s" (e.g., `${naming.stagingExample}`)" else ""
    s"""# ${orUnknown(projectName, "dbt Project")} — dbt Project Context
       |
       |> Auto-generated by graft (ariadne re-expression).
       |> Re-run `sync` after `dbt compile` to keep this file up to date.
       |
       |## Project Overview
       |- **Adapter**: ${orUnknown(adapterType, "unknown")}
       |- **Models**: ${snap.models.size} (${layerCount("staging")} staging, ${layerCount("intermediate")} intermediate, ${layerCount("marts")} marts$other)
       |- **Sources**: ${snap.sources.size} sources across $sourceSchemaCount source schemas
       |- **Tests**: $testCount tests (~$coveragePct% column coverage)
       |- **Macros**: $projectMacroCount project macros
       |
       |## Naming Conventions (auto-detected)
       |- **Staging**: `${naming.stagingPattern}`$stagingEx
       |- **Intermediate**: `${naming.intermediatePattern}`
       |- **Marts**: `${naming.martsPattern}`
       |- **Materialization**: staging=${naming.stagingMaterialization}, intermediate=${naming.intermediateMaterialization}, marts=${naming.martsMaterialization}
       |- **YAML schema files**: `${naming.yamlPattern}`
       |
       |## Key Models (highest connectivity)
       |$keyModelBullets
       |
       |## Working with AI Agents
       |- **ALWAYS** call `get_context_capsule` before modifying any model
       |- **NEVER** guess column values — check existing tests or use `get_model_details`
       |- **BEFORE** completing a task, verify test coverage with `get_test_coverage`
       |- **BEFORE** refactoring, check blast radius with `get_impact_analysis`
       |- When creating new models, follow the naming and materialization conventions above
       |- Follow this project's test patterns: ${naming.yamlRequirements}
       |
       |## Engine Tools
       |- `get_context_capsule` — **primary tool**: one call returns pre-filtered, token-budgeted context for any task
       |- `search_models` — find models by name, description, or column content
       |- `get_lineage` — upstream/downstream DAG traversal to configurable depth
       |- `get_model_details` — full details for a specific model (SQL, columns, tests, lineage)
       |- `get_impact_analysis` — blast radius of changing a model
       |- `get_test_coverage` — test gaps and suggestions for a model
       |- `refresh_index` — re-index after `dbt compile`
       |""".stripMargin
  }

  /** generator.py:170-187 — created only when absent. */
  def initialMemoryMd(): String = {
    val today = java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd")
      .withZone(java.time.ZoneOffset.UTC).format(java.time.Instant.now())
    s"""# Project Memory (auto-updated)
       |> Initialized: $today
       |
       |## Recent Changes
       |<!-- entries appended here after significant sessions -->
       |
       |## Known Issues
       |<!-- Add known data quality issues, source problems, or model gotchas here -->
       |
       |## Domain Knowledge
       |<!-- Add project-specific business rules and definitions here -->
       |
       |## Agent Notes
       |<!-- Persistent notes for AI agents about this project's conventions -->
       |""".stripMargin
  }

  /** templates/skill_new_model.j2 */
  def skillNewModel(): String = {
    val example = exampleModel("staging").orElse(exampleModel("marts"))
    val exampleBlock = example.map { m =>
      val code = Option(m.rawCode).getOrElse("")
      val truncated = if (code.length > 800) code.take(800) + "\n-- ... (truncated)" else code
      s"""
         |## Example Model From This Project
         |**File**: `${m.filePath}`
         |
         |```sql
         |$truncated
         |```
         |""".stripMargin
    }.getOrElse("")
    val yaml = exampleTestYaml()
    val yamlBlock = if (yaml.nonEmpty)
      s"""
         |## Example YAML Entry From This Project
         |```yaml
         |$yaml
         |```
         |""".stripMargin
    else ""
    s"""# How to Create a New Model in This Project
       |
       |> Auto-generated from project pattern analysis.
       |
       |## Naming Conventions
       |${naming.namingSummary}
       |
       |### By Layer
       |- **Staging** (`models/staging/{source}/`): `${naming.stagingPattern}`
       |- **Intermediate** (`models/intermediate/`): `${naming.intermediatePattern}`
       |- **Marts** (`models/marts/{domain}/`): `${naming.martsPattern}`
       |
       |## Materialization
       |- **Staging**: `${naming.stagingMaterialization}` (set in dbt_project.yml — do not override in model config unless necessary)
       |- **Intermediate**: `${naming.intermediateMaterialization}`
       |- **Marts**: `${naming.martsMaterialization}`
       |
       |## Required YAML Documentation
       |${naming.yamlRequirements}
       |
       |YAML file location: `${naming.yamlPattern}`
       |
       |### Minimum required YAML entry
       |```yaml
       |models:
       |  - name: your_model_name
       |    description: "What this model represents"
       |    columns:
       |      - name: id
       |        description: "Primary key"
       |        tests:
       |          - not_null
       |          - unique
       |```
       |$exampleBlock$yamlBlock
       |## Before Completing
       |1. Run `dbt compile` to verify SQL compiles without errors
       |2. Call `get_test_coverage` to verify test requirements are met
       |3. Call `get_impact_analysis` if modifying an existing model
       |4. Re-run `sync` to update the context index
       |""".stripMargin
  }

  /** templates/skill_debug_test.j2 */
  def skillDebugTest(): String = {
    val adapterNotes = adapterType match {
      case "bigquery" =>
        "- BigQuery: `INT64` vs `FLOAT64` type mismatches in `accepted_values`\n" +
          "- BigQuery: case sensitivity in string comparisons"
      case "snowflake" =>
        "- Snowflake: `VARIANT` columns require CAST before comparison\n" +
          "- Snowflake: case-insensitive by default — check if tests expect specific case"
      case "redshift" =>
        "- Redshift: `VARCHAR` length limits can cause silent truncation"
      case other =>
        s"- Check adapter-specific type handling for your warehouse ($other)"
    }
    s"""# How to Debug a Failing Test in This Project
       |
       |> Auto-generated from project pattern analysis.
       |
       |## Step-by-Step Debugging Process
       |
       |1. **Get context**: Call `get_context_capsule` with `intent="debug"` and the failing model name
       |2. **Check run results**: Look at `target/run_results.json` for the exact error message
       |3. **Trace upstream**: test failures are typically caused by source freshness issues,
       |   NULL propagation from the staging layer, or accepted-values drift
       |4. **For `not_null` failures**: Trace the column upstream with `get_lineage`
       |5. **For `accepted_values` failures**: Check the SOURCE table directly
       |6. **For `unique` failures**: Check for fan-out in JOINs
       |7. **For `relationships` failures**: The referenced column/table may have changed
       |
       |## Project-Specific Notes
       |- **Adapter**: $adapterType
       |- **Test coverage**: ~$coveragePct% of columns have tests
       |
       |## Common Test Failure Patterns
       |$adapterNotes
       |
       |## Useful Commands
       |```bash
       |dbt test --select test_name
       |dbt test --select model_name
       |dbt test --select model_name --store-failures
       |```
       |
       |## After Fixing
       |1. Re-run `dbt test --select <model_name>` to verify the fix
       |2. Call `refresh_index` to update run results in the context engine
       |""".stripMargin
  }

  /** templates/dag_summary.j2 */
  def dagSummary(): String = {
    val other = if (layerCount("other") > 0) s"\n  - Other: ${layerCount("other")}" else ""
    val intermediateLine = if (layerCount("intermediate") > 0)
      s"\n        └── Intermediate (${layerCount("intermediate")} models)" else ""
    val keyRows = keyModels().map(m =>
      s"| `${m.name}` | ${m.layerOrOther} | ${m.upstreamCount} upstream | ${m.downstreamCount} downstream |")
      .mkString("\n")
    val tags = commonTags()
    val tagsLine = if (tags.nonEmpty) tags.mkString(", ") else "None detected"
    s"""# DAG Summary — ${orUnknown(projectName, "dbt Project")}
       |
       |> Auto-generated. Re-run `sync` to update.
       |> Last indexed: $nowUtc
       |
       |## Project Structure
       |- **Total models**: ${snap.models.size}
       |  - Staging: ${layerCount("staging")}
       |  - Intermediate: ${layerCount("intermediate")}
       |  - Marts: ${layerCount("marts")}$other
       |- **Sources**: ${snap.sources.size} tables across $sourceSchemaCount schemas
       |- **Exposures**: $exposureCount
       |- **Tests**: $testCount (~$coveragePct% column coverage)
       |
       |## Layer Architecture
       |```
       |Sources (${snap.sources.size})
       |  └── Staging (${layerCount("staging")} models) — ${naming.stagingMaterialization}$intermediateLine
       |            └── Marts (${layerCount("marts")} models) — ${naming.martsMaterialization}
       |                   └── Exposures ($exposureCount)
       |```
       |
       |## Naming Conventions
       |- **Staging**: `${naming.stagingPattern}`
       |- **Intermediate**: `${naming.intermediatePattern}`
       |- **Marts**: `${naming.martsPattern}`
       |
       |## Most Connected Models (by degree centrality)
       |$keyRows
       |
       |## Common Tags
       |$tagsLine
       |""".stripMargin
  }

  /** templates/cursor_rules.j2 — also used for windsurf. */
  def cursorRules(): String =
    s"""---
       |description: dbt project context rules for ${orUnknown(projectName, "this project")}
       |globs: ["models/**/*.sql", "models/**/*.yml", "*.yml"]
       |alwaysApply: true
       |---
       |
       |# ${orUnknown(projectName, "dbt Project")} — AI Agent Rules
       |
       |## Project Context
       |- **Adapter**: $adapterType
       |- **Models**: ${snap.models.size} (${layerCount("staging")} staging, ${layerCount("intermediate")} intermediate, ${layerCount("marts")} marts)
       |- **Sources**: ${snap.sources.size}
       |
       |## Naming Conventions
       |- Staging: `${naming.stagingPattern}`
       |- Intermediate: `${naming.intermediatePattern}`
       |- Marts: `${naming.martsPattern}`
       |
       |## Materialization
       |- Staging: `${naming.stagingMaterialization}`
       |- Intermediate: `${naming.intermediateMaterialization}`
       |- Marts: `${naming.martsMaterialization}`
       |
       |## Rules
       |- ALWAYS call `get_context_capsule` before modifying any model
       |- NEVER guess column values — use `get_model_details` to inspect the schema
       |- BEFORE completing, verify test coverage with `get_test_coverage`
       |- BEFORE refactoring, check blast radius with `get_impact_analysis`
       |- Follow this project's naming and materialization conventions above
       |
       |## Engine Tools Available
       |- `get_context_capsule(task)` — primary tool, returns pre-filtered context
       |- `search_models(query)` — find models by name or description
       |- `get_lineage(model_name)` — DAG traversal
       |- `get_model_details(model_name)` — full SQL, columns, tests
       |- `get_impact_analysis(model_name)` — blast radius
       |- `get_test_coverage(model_name)` — test gaps
       |""".stripMargin
}
