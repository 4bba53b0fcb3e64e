package graft

import graft.patterns.Patterns

/** Patterns tier (mirrors tests/test_patterns.py): stats equality vs
  * the fixture, mode materialization, coverage, naming. */
class PatternsSpec extends SparkSuite {

  private lazy val p = new Patterns(SparkSuite.catalog)

  test("project stats rollup") {
    val r = p.stats().collect().head
    assert(r.getAs[Long]("models") == 6L)
    assert(r.getAs[Long]("sources") == 3L)
    assert(r.getAs[Long]("source_systems") == 1L)
    assert(r.getAs[Long]("tests") == 7L)
    assert(r.getAs[Long]("macros") == 1L)
    assert(r.getAs[Long]("exposures") == 1L)
    assert(r.getAs[Long]("total_columns") == 24L)
    assert(r.getAs[Long]("tested_columns") == 4L)
    assert(math.abs(r.getAs[Double]("column_coverage_pct") - 100.0 * 4 / 24) < 1e-9)
  }

  test("layer counts") {
    val m = p.layerCounts().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m == Map("staging" -> 3L, "intermediate" -> 1L, "marts" -> 2L))
  }

  test("most common materialization per layer") {
    val m = p.materializationByLayer().collect()
      .map(r => r.getAs[String]("layer") -> r.getAs[String]("materialization")).toMap
    assert(m("staging") == "view")
    assert(m("intermediate") == "ephemeral")
    assert(m("marts") == "table")
  }

  test("coverage by layer") {
    val m = p.coverageByLayer().collect()
      .map(r => r.getAs[String]("layer") -> r.getAs[Long]("tested_cols")).toMap
    assert(m("staging") == 2L) // stg_orders.order_id, stg_payments.method
    assert(m("marts") == 2L) // fct_orders.order_id, fct_orders.customer_id
  }

  test("top tags") {
    val m = p.topTags().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m("core") == 2L)
    assert(m("daily") == 1L)
  }

  test("naming patterns") {
    val r = p.naming().collect().head
    assert(r.getAs[String]("staging_example") == "stg_customers")
    assert(!r.getAs[Boolean]("uses_double_underscore"))
    assert(r.getAs[Boolean]("has_int_prefix"))
    assert(r.getAs[Boolean]("has_fct_prefix"))
    assert(r.getAs[Boolean]("has_dim_prefix"))
  }

  test("example per layer picks the widest model") {
    val m = p.examplePerLayer().collect()
      .map(r => r.getAs[String]("layer") -> r.getAs[String]("name")).toMap
    assert(m("staging") == "stg_orders") // 5 columns beats 4
  }
}
