package graft

import org.apache.spark.sql.functions._

import graft.search.{HybridSearch, Porter}

/** Search tier (mirrors tests/test_search.py): stemmer properties,
  * recall, exclusion, lookups, finders. */
class SearchSpec extends SparkSuite {

  private lazy val cat = SparkSuite.catalog
  private lazy val hs = new HybridSearch(cat)

  test("porter stemmer basics") {
    assert(Porter.stem("orders") == "order")
    assert(Porter.stem("running") == "run")
    assert(Porter.stem("staged") == "stage")
    assert(Porter.stem("relational") == "relat")
    assert(Porter.stem("caresses") == "caress")
    assert(Porter.stem("ponies") == "poni")
    assert(Porter.stem("ab") == "ab", "short words unchanged")
  }

  test("query tokenizer drops stopwords and short tokens") {
    val t = HybridSearch.tokenizeQuery("the revenue of an order")
    assert(!t.contains("the") && !t.contains("of") && !t.contains("an"))
    assert(t.contains("revenu") || t.contains("revenue"))
  }

  test("search 'orders' recalls order models with positive scores") {
    val hits = hs.search("orders", limit = 10).collect()
    val names = hits.map(_.getAs[String]("name")).toSet
    assert(names.contains("stg_orders"))
    assert(names.contains("fct_orders"))
    assert(hits.forall(_.getAs[Double]("score") >= 0.0))
  }

  test("search respects limit and excludeIds") {
    assert(hs.search("orders", limit = 2).count() <= 2)
    val excluded = hs.search("orders", limit = 10,
      excludeIds = Seq("model.shoply.stg_orders")).collect()
    assert(!excluded.map(_.getAs[String]("unique_id")).contains("model.shoply.stg_orders"))
  }

  test("whole-query name substring earns the name bonus") {
    val hits = hs.search("fct_orders", limit = 5).collect()
    val fct = hits.find(_.getAs[String]("name") == "fct_orders").get
    assert(fct.getAs[Double]("name_bonus") == 0.15)
  }

  test("case-insensitive lookup by name and by id") {
    assert(hs.lookup("FCT_ORDERS").collect().head.getAs[String]("unique_id") ==
      "model.shoply.fct_orders")
    assert(hs.lookup("model.shoply.dim_customers").collect().head.getAs[String]("name") ==
      "dim_customers")
  }

  test("find by column name hits all models carrying it") {
    val names = hs.findByColumn("customer_id").collect().map(_.getAs[String]("name")).toSet
    assert(names == Set("stg_orders", "stg_customers", "int_order_payments",
      "fct_orders", "dim_customers"))
  }

  test("find by path pattern") {
    val names = hs.findByPath("models/staging/%").collect().map(_.getAs[String]("name")).toSeq
    assert(names == Seq("stg_customers", "stg_orders", "stg_payments"), "ordered by name")
  }

  test("path resolution by exact path and basename") {
    val r = hs.resolvePaths(Seq("models/marts/fct_orders.sql", "stg_payments.sql",
      "schema.yml")).collect().map(_.getString(0)).toSet
    assert(r == Set("model.shoply.fct_orders", "model.shoply.stg_payments"))
  }

  test("columns with tests for stg_orders") {
    val rows = hs.columnsWithTests("model.shoply.stg_orders").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[scala.collection.Seq[String]]("tests").toSeq).toMap
    assert(rows("order_id") == Seq("not_null", "unique"))
    assert(rows("status") == Nil)
  }

  test("macro containment join: compiled-first, raw fallback") {
    // stg_orders' compiled SQL has the macro expanded -> no hit (parity
    // with the reference's compiled-first semantics); stg_payments has
    // no compiled code, so the raw code (with the macro call) is used.
    assert(hs.macrosForModel("model.shoply.stg_orders").count() == 0)
    val macros = hs.macrosForModel("model.shoply.stg_payments").collect()
      .map(_.getAs[String]("name")).toSet
    assert(macros == Set("normalize_amount"))
  }

  test("direct upstream sources") {
    val srcs = hs.sourcesForModel("model.shoply.stg_orders").collect()
      .map(_.getAs[String]("name")).toSet
    assert(srcs == Set("orders"))
  }

  test("test coverage report") {
    val cov = hs.testCoverage("model.shoply.fct_orders").collect()
      .map(r => r.getAs[String]("name") -> r.getAs[Boolean]("is_tested")).toMap
    assert(cov("order_id"))
    assert(cov("customer_id"))
    assert(!cov("region"))
  }
}
