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

  test("serving-tier patternsSummary ≡ the distributed formulations") {
    val cat = SparkSuite.catalog
    val s = cat.snapshot.patternsSummary(cat.exposures.count())
    // stats row fields
    val r = p.stats().collect().head
    assert(s("models") == r.getAs[Long]("models"))
    assert(s("sources") == r.getAs[Long]("sources"))
    assert(s("source_systems") == r.getAs[Long]("source_systems"))
    assert(s("tests") == r.getAs[Long]("tests"))
    assert(s("macros") == r.getAs[Long]("macros"))
    assert(s("exposures") == r.getAs[Long]("exposures"))
    assert(s("total_columns") == r.getAs[Long]("total_columns"))
    assert(s("tested_columns") == r.getAs[Long]("tested_columns"))
    assert(math.abs(s("column_coverage_pct").asInstanceOf[Double] -
      r.getAs[Double]("column_coverage_pct")) < 1e-9)
    // layer counts
    val lc = p.layerCounts().collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(s("layer_counts").asInstanceOf[Map[String, Any]] == lc)
    // materialization mode per layer (value + count)
    val mat = p.materializationByLayer().collect()
      .map(x => x.getAs[String]("layer") ->
        (x.getAs[String]("materialization"), x.getAs[Long]("n"))).toMap
    s("materialization_by_layer").asInstanceOf[Map[String, Any]].foreach { case (l, v) =>
      val m = v.asInstanceOf[Map[String, Any]]
      assert((m("materialization"), m("n")) == mat(l), s"layer $l")
    }
    // coverage per layer
    val cov = p.coverageByLayer().collect()
      .map(x => x.getAs[String]("layer") ->
        (x.getAs[Long]("total_cols"), x.getAs[Long]("tested_cols"))).toMap
    s("coverage_by_layer").asInstanceOf[Map[String, Any]].foreach { case (l, v) =>
      val m = v.asInstanceOf[Map[String, Any]]
      assert((m("total_cols"), m("tested_cols")) == cov(l), s"layer $l")
    }
    // naming flags + example
    val n = p.naming().collect().head
    val sn = s("naming").asInstanceOf[Map[String, Any]]
    assert(sn("staging_example") == n.getAs[String]("staging_example"))
    assert(sn("uses_double_underscore") == n.getAs[Boolean]("uses_double_underscore"))
    assert(sn("has_fct_prefix") == n.getAs[Boolean]("has_fct_prefix"))
    // top tags
    val tags = p.topTags().collect().map(x => (x.getString(0), x.getLong(1))).toSeq
    val stags = s("top_tags").asInstanceOf[Seq[Map[String, Any]]]
      .map(m => (m("tag"), m("n")))
    assert(stags == tags)
  }
}
