package graft.generate

import org.apache.spark.sql.functions._

import graft.graph.Lineage
import graft.model.Catalog
import graft.patterns.Patterns

/** Report generation — the markdown context files the reference renders
  * from Jinja templates (`/root/reference/src/ariadne_dbt/generator.py:
  * 28-160`, the templates directory): a project summary and a DAG summary,
  * assembled driver-side from collected aggregate rows (all inputs are
  * top-k or single-row frames). Plain Scala string templating — the
  * template engine is not part of the queryable surface.
  */
class Reports(catalog: Catalog) {

  private val patterns = new Patterns(catalog)
  private val lineage = new Lineage(catalog)

  private def projectName: String =
    catalog.metadata.filter(col("key") === "project_name")
      .collect().headOption.map(_.getString(1)).getOrElse("unknown")

  /** CLAUDE.md-style project context summary. */
  def projectSummary(): String = {
    val s = patterns.stats().collect().head
    val layers = patterns.layerCounts().collect()
      .map(r => s"- ${r.getString(0)}: ${r.getLong(1)} models").mkString("\n")
    val mats = patterns.materializationByLayer().collect()
      .map(r => s"- ${r.getAs[String]("layer")}: ${r.getAs[String]("materialization")}")
      .mkString("\n")
    val n = patterns.naming().collect().head
    s"""# ${projectName} — dbt project context
       |
       |## Scale
       |- models: ${s.getAs[Long]("models")}
       |- sources: ${s.getAs[Long]("sources")} (from ${s.getAs[Long]("source_systems")} systems)
       |- tests: ${s.getAs[Long]("tests")} (column coverage ${f"${s.getAs[Double]("column_coverage_pct")}%.1f"}%%)
       |- macros: ${s.getAs[Long]("macros")}, exposures: ${s.getAs[Long]("exposures")}
       |
       |## Layers
       |$layers
       |
       |## Materializations (most common per layer)
       |$mats
       |
       |## Naming
       |- staging example: ${n.getAs[String]("staging_example")}
       |- fct_ prefix: ${n.getAs[Boolean]("has_fct_prefix")}, dim_ prefix: ${n.getAs[Boolean]("has_dim_prefix")}, int_ prefix: ${n.getAs[Boolean]("has_int_prefix")}
       |""".stripMargin
  }

  /** DAG summary: the most central models with their degree counts. */
  def dagSummary(k: Int = 10): String = {
    val rows = lineage.topCentral(k).collect().map { r =>
      f"| ${r.getAs[String]("name")}%-30s | ${r.getAs[String]("layer")}%-12s | ${r.getAs[Double]("centrality")}%.3f | ${r.getAs[Long]("downstream_count")}%d |"
    }.mkString("\n")
    s"""# ${projectName} — DAG summary
       |
       || model | layer | centrality | downstream |
       ||---|---|---|---|
       |$rows
       |""".stripMargin
  }
}
