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
}
