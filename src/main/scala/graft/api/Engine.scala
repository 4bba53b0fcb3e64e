package graft.api

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.capsule.CapsuleBuilder
import graft.graph.Lineage
import graft.ingest.ManifestReader
import graft.model.{Catalog, ContextCapsule, DiscoverEntry}
import graft.patterns.Patterns
import graft.search.HybridSearch

/** Capability facade mirroring the reference's 9 MCP tools + CLI verbs
  * (`/root/reference/src/ariadne_dbt/server.py:54-518`,
  * `cli.py:26-365`) — the contract a user of the reference programs
  * against, minus the stdio transport:
  *
  *   get_context_capsule, discover_models, get_model_details,
  *   get_lineage, get_impact_analysis, search_models,
  *   find_models_by_column, find_models_by_path, refresh_index
  *   (+ rate_capsule via [[graft.usage.UsageLog]]).
  *
  * Parameter clamps (limit ≤ 50, depth ≤ 10 — server.py:148,266,338,363)
  * live here, at the API boundary, exactly as in the reference.
  */
class Engine private (spark: SparkSession, manifestPath: String, var catalog: Catalog) {

  private var hybrid = new HybridSearch(catalog)
  private var lineageOps = new Lineage(catalog)
  private var patternsOps = new Patterns(catalog)
  private var capsules = new CapsuleBuilder(catalog, hybrid, lineageOps, patternsOps)

  private def clampLimit(l: Int, cap: Int = 50): Int = math.min(math.max(1, l), cap)
  private def clampDepth(d: Int): Int = math.min(math.max(0, d), 10)

  def getContextCapsule(task: String, focusModel: Option[String] = None,
      entryModels: Seq[String] = Nil, entryPaths: Seq[String] = Nil,
      tokenBudget: Option[Int] = None): ContextCapsule =
    capsules.build(task, focusModel, entryModels, entryPaths, tokenBudget)

  def discoverModels(task: String, focusModel: Option[String] = None,
      entryModels: Seq[String] = Nil, entryPaths: Seq[String] = Nil,
      limit: Int = 40): Seq[DiscoverEntry] =
    capsules.discover(task, focusModel, entryModels, entryPaths, clampLimit(limit, 80))

  def getModelDetails(modelName: String): DataFrame = {
    val m = hybrid.lookup(modelName)
    m.select(col("unique_id"), col("name"), col("layer"), col("materialization"),
      col("file_path"), col("description"), col("upstream_count"),
      col("downstream_count"), col("centrality"))
  }

  def getColumns(modelId: String): DataFrame = hybrid.columnsWithTests(modelId)

  def getLineage(modelId: String, upDepth: Int = 3, downDepth: Int = 3): DataFrame =
    lineageOps.lineage(modelId, clampDepth(upDepth), clampDepth(downDepth))

  def getImpactAnalysis(modelId: String, depth: Int = 5): DataFrame =
    lineageOps.impact(modelId, clampDepth(depth))

  def searchModels(query: String, limit: Int = 10, intent: String = "explore",
      layer: Option[String] = None): DataFrame = {
    val res = hybrid.search(query, intent, clampLimit(limit) * 2)
    layer.fold(res)(l => res.filter(col("layer") === l))
      .limit(clampLimit(limit))
  }

  def findModelsByColumn(columnName: String, limit: Int = 20): DataFrame =
    hybrid.findByColumn(columnName, clampLimit(limit))

  def findModelsByPath(pathPattern: String, limit: Int = 20): DataFrame =
    hybrid.findByPath(pathPattern, clampLimit(limit))

  def getProjectStats(): DataFrame = patternsOps.stats()
  def getPatterns(): Patterns = patternsOps
  def getTopCentral(k: Int = 10): DataFrame = lineageOps.topCentral(k)
  def sourceDeps(modelId: String): DataFrame = lineageOps.sourceDeps(modelId)
  def testCoverage(modelId: String): DataFrame = hybrid.testCoverage(modelId)

  /** Full re-ingest (always a full rebuild — server.py:450-458). */
  def refreshIndex(): Unit = {
    catalog = ManifestReader.read(spark, manifestPath)
    hybrid = new HybridSearch(catalog)
    lineageOps = new Lineage(catalog)
    patternsOps = new Patterns(catalog)
    capsules = new CapsuleBuilder(catalog, hybrid, lineageOps, patternsOps)
  }
}

object Engine {
  /** `ariadne init`-equivalent: ingest a manifest and serve queries. */
  def fromManifest(spark: SparkSession, manifestPath: String): Engine =
    new Engine(spark, manifestPath, ManifestReader.read(spark, manifestPath))
}
