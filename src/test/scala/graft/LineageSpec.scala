package graft

import org.apache.spark.sql.functions._

import graft.graph.{Bfs, Lineage}

/** Graph tier (mirrors tests/test_graph.py): exact reach sets at
  * bounded depths, depth-0 empty, impact risk, top centrality. */
class LineageSpec extends SparkSuite {

  private lazy val cat = SparkSuite.catalog
  private lazy val lin = new Lineage(cat)

  private def ids(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.select("id").collect().map(_.getString(0)).toSet

  test("upstream depth 1 from fct_orders") {
    assert(ids(lin.upstream("model.shoply.fct_orders", 1)) ==
      Set("model.shoply.int_order_payments", "model.shoply.stg_customers"))
  }

  test("upstream depth 2 adds grandparents with min distance") {
    val rows = lin.upstream("model.shoply.fct_orders", 2)
      .select("id", "distance").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(rows("model.shoply.stg_orders") == 2)
    assert(rows("model.shoply.stg_payments") == 2)
    assert(rows("source.shoply.raw.customers") == 2)
    assert(rows("model.shoply.int_order_payments") == 1)
  }

  test("downstream depth 2 from stg_orders includes fct via int") {
    val rows = ids(lin.downstream("model.shoply.stg_orders", 2))
    assert(rows.contains("model.shoply.int_order_payments"))
    assert(rows.contains("model.shoply.dim_customers"))
    assert(rows.contains("model.shoply.fct_orders"))
    assert(!rows.contains("model.shoply.stg_orders"), "start node excluded")
  }

  test("depth 0 is empty") {
    assert(lin.upstream("model.shoply.fct_orders", 0).count() == 0)
  }

  test("impact analysis from stg_orders reaches the exposure") {
    val r = lin.impact("model.shoply.stg_orders", 5).collect().head
    assert(r.getAs[Long]("n_exposures") == 1L)
    assert(r.getAs[String]("risk") == "high")
  }

  test("source dependencies of fct_orders") {
    val deps = lin.sourceDeps("model.shoply.fct_orders")
      .select("id").collect().map(_.getString(0)).toSet
    assert(deps == Set("source.shoply.raw.orders", "source.shoply.raw.customers",
      "source.shoply.raw.payments"))
  }

  test("top centrality is fct_orders") {
    val top = lin.topCentral(1).collect().head
    assert(top.getAs[String]("unique_id") == "model.shoply.fct_orders")
  }

  test("bfs distance minimality property (dist grows by ≤1 per hop)") {
    import spark.implicits._
    val reach = Bfs.traverse(cat.edges, Seq("model.shoply.stg_orders").toDF("id"), 3, up = false)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    val edges = cat.edges.collect().map(r => r.getString(0) -> r.getString(1))
    for ((p, c) <- edges if reach.contains(p) && reach.contains(c))
      assert(reach(c) <= reach(p) + 1, s"non-minimal distance $p -> $c")
  }
}
