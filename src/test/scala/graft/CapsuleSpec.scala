package graft

import graft.capsule.CapsuleBuilder
import graft.graph.Lineage
import graft.patterns.Patterns
import graft.search.HybridSearch

/** Capsule tier (mirrors tests/test_capsule.py): intent detection,
  * pivots, budget bound, disjoint rings, confidence, discover. */
class CapsuleSpec extends SparkSuite {

  private lazy val cat = SparkSuite.catalog
  private lazy val builder = new CapsuleBuilder(cat, new HybridSearch(cat),
    new Lineage(cat), new Patterns(cat))

  test("intent detection per intent with explore fallback") {
    assert(CapsuleBuilder.detectIntent("fix the broken revenue number") == "debug")
    assert(CapsuleBuilder.detectIntent("add a new metric for margin") == "add_feature")
    assert(CapsuleBuilder.detectIntent("refactor the payments model") == "refactor")
    assert(CapsuleBuilder.detectIntent("improve coverage with a not-null check") == "test")
    assert(CapsuleBuilder.detectIntent("document the customer dimension") == "document")
    assert(CapsuleBuilder.detectIntent("qqqq zzzz") == "explore")
  }

  test("tie priority follows keyword-table order (debug wins)") {
    // "fix" (debug) and "add" (add_feature) both score 1 → first table entry wins.
    assert(CapsuleBuilder.detectIntent("fix and add") == "debug")
  }

  test("focus model becomes pivot with high confidence") {
    val c = builder.build("look at revenue", focusModel = Some("fct_orders"))
    assert(c.pivotModels.map(_.uniqueId).contains("model.shoply.fct_orders"))
    assert(c.confidence == "high")
  }

  test("entry paths become pivots") {
    val c = builder.build("anything", entryPaths = Seq("models/staging/stg_orders.sql"))
    assert(c.pivotModels.map(_.uniqueId).contains("model.shoply.stg_orders"))
  }

  test("budget respected within 1.2x") {
    val c = builder.build("debug failing test on revenue model",
      focusModel = Some("fct_orders"), tokenBudget = Some(5000))
    assert(c.tokenEstimate <= (5000 * 1.2).toInt, s"estimate ${c.tokenEstimate}")
  }

  test("pivot, upstream, downstream rings are disjoint") {
    val c = builder.build("debug the order totals", focusModel = Some("fct_orders"))
    val p = c.pivotModels.map(_.uniqueId).toSet
    val u = c.upstreamModels.map(_.uniqueId).toSet
    val d = c.downstreamModels.map(_.uniqueId).toSet
    assert((p & u).isEmpty && (p & d).isEmpty)
  }

  test("upstream ring of a debug capsule reaches staging") {
    val c = builder.build("debug wrong totals", focusModel = Some("fct_orders"))
    // debug depths = (2, 1): pivot ∪ upstream must cover fct's 2-hop
    // ancestry; the ring itself holds only non-pivot models.
    val ring = c.upstreamModels.map(_.uniqueId)
    assert(ring.nonEmpty && ring.forall(_.startsWith("model.")))
    val covered = ring.toSet ++ c.pivotModels.map(_.uniqueId).toSet
    assert(covered.contains("model.shoply.int_order_payments"))
    assert(covered.contains("model.shoply.stg_customers"))
  }

  test("low confidence carries refinement hints") {
    val (conf, hints) = CapsuleBuilder.computeConfidence(hasExplicit = false, Seq(0.1, 0.1, 0.1))
    assert(conf == "low")
    assert(hints.size == 3)
  }

  test("confidence tiers from bm25 spread") {
    assert(CapsuleBuilder.computeConfidence(false, Seq(10.0, 5.0, 4.0))._1 == "high")
    assert(CapsuleBuilder.computeConfidence(false, Seq(8.0, 5.5, 5.0))._1 == "medium")
    assert(CapsuleBuilder.computeConfidence(false, Seq(6.0))._1 == "medium")
    assert(CapsuleBuilder.computeConfidence(true, Nil)._1 == "high")
  }

  test("discover returns tagged entries, deduped, within limit") {
    val entries = builder.discover("orders revenue", limit = 10)
    assert(entries.size <= 10)
    assert(entries.map(_.uniqueId).distinct.size == entries.size)
    assert(entries.exists(_.relationship == "pivot"))
    assert(entries.forall(e => Set("pivot", "upstream", "downstream", "search")(e.relationship)))
  }

  test("discover superset: capsule pivots appear in discover") {
    val c = builder.build("orders revenue", focusModel = Some("fct_orders"))
    val d = builder.discover("orders revenue", focusModel = Some("fct_orders"), limit = 40)
    val dIds = d.map(_.uniqueId).toSet
    assert(c.pivotModels.map(_.uniqueId).forall(dIds.contains))
  }
}
