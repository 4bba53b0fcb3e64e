package graft

import org.apache.spark.sql.functions._

import graft.generate.Reports
import graft.ingest.Enrichment

/** catalog.json / run_results.json enrichment + report generation. */
class EnrichSpec extends SparkSuite {

  test("catalog enrichment: row stats with key fallback, case-insensitive column types") {
    val cat = Enrichment.withCatalog(SparkSuite.catalog, spark, fixturePath("catalog.json"))
    val m = cat.models.select("unique_id", "row_count", "bytes").collect()
      .map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(m("model.shoply.fct_orders") == ((Some(1200L), Some(45000L))))
    assert(m("model.shoply.stg_orders") == ((Some(1250L), Some(52000L))), "row_count/bytes fallback keys")
    assert(m("model.shoply.dim_customers") == ((None, None)), "unenriched models stay null")

    val types = cat.columns.filter(col("model_id") === "model.shoply.fct_orders")
      .collect().map(r => r.getAs[String]("name") -> r.getAs[String]("data_type")).toMap
    assert(types("order_id") == "BIGINT", "catalog type wins, matched case-insensitively")
    assert(types("region") == "VARCHAR")
  }

  test("run_results enrichment: status, failures, summed timing") {
    val cat = Enrichment.withRunResults(SparkSuite.catalog, spark, fixturePath("run_results.json"))
    val t = cat.tests
      .select("unique_id", "last_status", "last_failures", "last_execution_time").collect()
      .map(r => r.getString(0) -> r).toMap
    val passed = t("test.shoply.not_null_stg_orders_order_id")
    assert(passed.getAs[String]("last_status") == "pass")
    assert(math.abs(passed.getAs[Double]("last_execution_time") - 1.0) < 1e-9)
    val failed = t("test.shoply.unique_fct_orders_order_id")
    assert(failed.getAs[String]("last_status") == "fail")
    assert(failed.getAs[Long]("last_failures") == 3L)
    assert(t("test.shoply.accepted_values_stg_payments_method").getAs[String]("last_status") == null)
  }

  test("report generation carries project facts") {
    val reports = new Reports(SparkSuite.catalog)
    val summary = reports.projectSummary()
    assert(summary.contains("shoply"))
    assert(summary.contains("models: 6"))
    assert(summary.contains("staging example: stg_customers"))
    val dag = reports.dagSummary(3)
    assert(dag.contains("fct_orders"))
  }
}
