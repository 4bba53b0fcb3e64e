package graft

import java.nio.file.Files

import graft.ingest.Writer
import graft.usage.UsageLog

/** Round-trip persistence (S9) and usage-log analytics (A10/A11). */
class WriterUsageSpec extends SparkSuite {

  test("catalog round-trips through partitioned parquet, overwrite is idempotent") {
    val dir = Files.createTempDirectory("graft_writer").toString
    Writer.write(SparkSuite.catalog, dir)
    Writer.write(SparkSuite.catalog, dir) // overwrite = full-refresh idempotence
    val back = Writer.read(spark, dir)
    assert(back.models.count() == 6)
    assert(back.edges.count() == 18)
    assert(back.models.select("layer").distinct().count() == 3)
    // layer partition column survives the round trip for pruning
    assert(back.models.filter(org.apache.spark.sql.functions.col("layer") === "marts").count() == 2)
  }

  test("layer-filtered read of the partitioned models table prunes partitions") {
    val dir = Files.createTempDirectory("graft_writer_prune").toString
    Writer.write(SparkSuite.catalog, dir)
    val filtered = Writer.read(spark, dir).models
      .filter(org.apache.spark.sql.functions.col("layer") === "marts")
    val plan = filtered.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    val m = """PartitionFilters: \[([^\]]*)\]""".r.findFirstMatchIn(plan)
    assert(m.isDefined, "scan must report partition filters:\n" + plan)
    assert(m.get.group(1).trim.nonEmpty,
      "layer filter must land in PartitionFilters (partition pruning), " +
        "not in the data filters:\n" + plan)
    // and the pruned read returns exactly the marts rows
    assert(filtered.count() == 2)
  }

  test("usage log appends and aggregates") {
    val dir = Files.createTempDirectory("graft_usage").toString + "/log"
    val log = new UsageLog(spark, dir)
    log.log("search_models", "find revenue", "explore", 120, 35)
    log.log("get_context_capsule", "debug totals", "debug", 8000, 420, rating = Some(5))
    log.log("search_models", "orders", "explore", 90, 12)

    assert(log.all().count() == 3)
    val byTool = log.byTool().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTool("search_models") == 2L)
    val st = log.stats().collect().head
    assert(st.getAs[Long]("total_calls") == 3L)
    assert(st.getAs[Double]("avg_rating") == 5.0)
    assert(log.recent(2).count() == 2)
    assert(log.daily().collect().map(_.getAs[Long]("n")).sum == 3L)
  }

  test("rating events override the log-time rating, newest wins") {
    val dir = Files.createTempDirectory("graft_usage").toString + "/log"
    val log = new UsageLog(spark, dir)
    val id = log.log("get_context_capsule", "debug x", "debug", 5000, 300)
    log.rate(id, 2)
    log.rate(id, 9, notes = Some("actually perfect")) // clamps to 5
    val row = log.all().filter(org.apache.spark.sql.functions.col("log_id") === id)
      .collect().head
    assert(row.getAs[Long]("rating") == 5L)
    assert(row.getAs[String]("notes") == "actually perfect")
  }

  test("engine telemetry loop: tool calls log rows, rate_capsule lands, A10/A11 run over them") {
    val usagePath = Files.createTempDirectory("graft_engine_usage").toString + "/log"
    val engine = graft.api.Engine.fromManifest(spark,
      fixturePath("manifest.json"), usagePath = Some(usagePath))

    val capsule = engine.getContextCapsule("debug the revenue totals",
      focusModel = Some("fct_orders"))
    engine.searchModels("orders", limit = 5).collect()
    engine.getLineage("model.shoply.fct_orders").collect()
    val ratedId = engine.rateCapsule(4, Some("good context"))
    assert(ratedId.nonEmpty, "capsule call must be rateable")

    val byTool = engine.usage.byTool().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byTool("get_context_capsule") == 1L)
    assert(byTool("search_models") == 1L)
    assert(byTool("get_lineage") == 1L)

    // the capsule row carries its real token estimate + the rating
    val capsuleRow = engine.usage.all()
      .filter(org.apache.spark.sql.functions.col("log_id") === ratedId.get)
      .collect().head
    assert(capsuleRow.getAs[Long]("token_estimate") == capsule.tokenEstimate.toLong)
    assert(capsuleRow.getAs[Long]("rating") == 4L)
    assert(capsuleRow.getAs[Long]("pivot_count") == capsule.pivotModels.size.toLong)

    // A10 daily rollup + A11 recent over the engine's own telemetry
    assert(engine.usage.daily().collect().map(_.getAs[Long]("n")).sum == 3L)
    assert(engine.usage.recent(2).count() == 2)
  }
}
