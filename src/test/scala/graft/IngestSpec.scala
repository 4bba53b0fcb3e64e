package graft

import org.apache.spark.sql.functions._

/** Ingestion tier-1 behavior (mirrors tests/test_indexer.py of the
  * reference): entity counts, layer detection, edges, degrees,
  * centrality, PK/FK inference, idempotent re-read. */
class IngestSpec extends SparkSuite {

  private lazy val cat = SparkSuite.catalog

  test("entity counts") {
    assert(cat.models.count() == 6)
    assert(cat.tests.count() == 7)
    assert(cat.sources.count() == 3)
    assert(cat.macros.count() == 1)
    assert(cat.exposures.count() == 1)
    assert(cat.columns.count() == 24)
    assert(cat.edges.count() == 18)
  }

  test("metadata") {
    val md = cat.metadata.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(md("project_name") == "shoply")
    assert(md("adapter_type") == "spark")
  }

  test("layer detection from fqn path segments") {
    val layers = cat.models.select("name", "layer").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(layers("stg_orders") == "staging")
    assert(layers("int_order_payments") == "intermediate")
    assert(layers("fct_orders") == "marts")
    assert(layers("dim_customers") == "marts")
  }

  test("test-type classification incl. singular fallback") {
    val types = cat.tests.select("name", "test_type").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(types("not_null_stg_orders_order_id") == "not_null")
    assert(types("relationships_fct_orders_customer_id") == "relationships")
    assert(types("assert_positive_total") == "singular")
  }

  test("degree counts and centrality") {
    val rows = cat.models
      .select("name", "upstream_count", "downstream_count", "centrality").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(rows("stg_orders") == ((1L, 4L, 5.0 / 7.0)))
    assert(rows("fct_orders") == ((2L, 5L, 1.0)))
    assert(rows("int_order_payments")._1 == 2L)
    assert(rows("int_order_payments")._2 == 1L)
  }

  test("PK/FK inference from test types") {
    val flags = cat.columns
      .select(col("model_id"), col("name"), col("is_primary_key"), col("is_foreign_key"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> ((r.getBoolean(2), r.getBoolean(3)))).toMap
    assert(flags(("model.shoply.stg_orders", "order_id")) == ((true, false)))
    assert(flags(("model.shoply.fct_orders", "order_id")) == ((true, false)))
    assert(flags(("model.shoply.fct_orders", "customer_id")) == ((false, true)))
    assert(flags(("model.shoply.stg_payments", "method")) == ((false, false)))
  }

  test("re-read is idempotent") {
    val again = graft.ingest.ManifestReader.read(spark, fixturePath("manifest.json"))
    assert(again.models.count() == 6)
    assert(again.edges.count() == 18)
  }

  test("search index carries truncated sql and sorted column names") {
    val row = cat.searchIndex.filter(col("unique_id") === "model.shoply.stg_orders")
      .collect().head
    assert(row.getAs[String]("column_names") == "amount customer_id order_date order_id status")
    assert(row.getAs[String]("sql_text").contains("select order_id"))
  }
}
