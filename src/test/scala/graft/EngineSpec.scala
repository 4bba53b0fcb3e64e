package graft

import org.apache.spark.sql.functions._

import graft.api.Engine

/** End-to-end facade test: every tool of the reference's MCP surface
  * exercised through [[Engine]] against the fixture project — the
  * "switch your client to this library" contract. */
class EngineSpec extends SparkSuite {

  private lazy val engine = Engine.fromManifest(spark, fixturePath("manifest.json"))

  test("get_context_capsule") {
    val c = engine.getContextCapsule("debug the revenue totals",
      focusModel = Some("fct_orders"), tokenBudget = Some(6000))
    assert(c.intent == "debug")
    assert(c.pivotModels.nonEmpty)
    assert(c.tokenEstimate > 0 && c.tokenEstimate <= 7200)
    // sources are collected per-pivot from DIRECT parents only (parity):
    // a staging-focused capsule must surface its raw source.
    val cs = engine.getContextCapsule("explore order staging", focusModel = Some("stg_orders"))
    assert(cs.relevantSources.exists(_("unique_id") == "source.shoply.raw.orders"))
  }

  test("discover_models clamps limit to 80") {
    val d = engine.discoverModels("orders", limit = 500)
    assert(d.size <= 80)
    assert(d.nonEmpty)
  }

  test("get_model_details + columns") {
    val det = engine.getModelDetails("fct_orders").collect().head
    assert(det.getAs[String]("layer") == "marts")
    assert(det.getAs[Double]("centrality") == 1.0)
    assert(engine.getColumns("model.shoply.fct_orders").count() == 4)
  }

  test("composite model context mirrors the reference's details payload") {
    val ctx = engine.getModelContext("fct_orders").get
    assert(ctx.uniqueId == "model.shoply.fct_orders")
    assert(ctx.compiledSql.nonEmpty)
    assert(ctx.columns.size == 4)
    assert(ctx.upstreamModels.nonEmpty, "1-hop upstream names")
    assert(ctx.testCoverage.coveragePct ==
      ctx.testCoverage.testedColumns * 100 / ctx.testCoverage.totalColumns)
    // an untested model draws suggestions
    val stg = engine.getModelContext("stg_payments").get
    assert(stg.testCoverage.suggestions.nonEmpty)
    assert(engine.getModelContext("no_such_model").isEmpty)
  }

  test("get_lineage clamps depth and tags directions") {
    val lin = engine.getLineage("model.shoply.fct_orders", upDepth = 99, downDepth = 99)
      .collect()
    val dirs = lin.map(_.getAs[String]("direction")).toSet
    assert(dirs == Set("upstream", "downstream"))
    assert(lin.exists(_.getAs[String]("id") == "source.shoply.raw.orders"))
  }

  test("get_impact_analysis") {
    val r = engine.getImpactAnalysis("model.shoply.stg_customers").collect().head
    assert(r.getAs[Long]("n_models") >= 2)
    assert(Set("low", "medium", "high")(r.getAs[String]("risk")))
  }

  test("search_models with layer post-filter") {
    val hits = engine.searchModels("orders", limit = 10, layer = Some("marts")).collect()
    assert(hits.nonEmpty)
    assert(hits.forall(_.getAs[String]("layer") == "marts"))
  }

  test("find_models_by_column / by_path") {
    assert(engine.findModelsByColumn("order_id").count() >= 3)
    assert(engine.findModelsByPath("models/marts/%").count() == 2)
  }

  test("stats, coverage, top-central, refresh") {
    assert(engine.getProjectStats().collect().head.getAs[Long]("models") == 6L)
    assert(engine.testCoverage("model.shoply.stg_orders").count() == 5)
    assert(engine.getTopCentral(3).count() == 3)
    engine.refreshIndex()
    assert(engine.getProjectStats().collect().head.getAs[Long]("models") == 6L)
  }
}
