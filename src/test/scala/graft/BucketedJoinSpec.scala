package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Bucketing = the shuffle-elimination lever for repeated co-located
  * joins at 100 TB: both sides bucketed+sorted on the join key join
  * with ZERO shuffle exchanges. Verified against the physical plan. */
class BucketedJoinSpec extends SparkSuite {

  test("join of tables bucketed on the key plans without a shuffle") {
    val wh = Files.createTempDirectory("graft_buckets").toString
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a sort-merge join so the shuffle (or its absence) is visible
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val d = "/root/testdata/sf0.001"
      Tables.orders(spark, d).write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$wh/orders_b").saveAsTable("orders_b")
      Tables.lineitem(spark, d)
        .select(col("l_orderkey"), col("l_quantity")).write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$wh/lineitem_b").saveAsTable("lineitem_b")

      val joined = spark.table("lineitem_b")
        .join(spark.table("orders_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString

      assert(plan.contains("SortMergeJoin"))
      // the join itself must not shuffle either side; only the final
      // single aggregation exchange may appear after the join
      val joinPart = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey"),
        "bucketed side should not re-shuffle")
      assert(!joinPart.contains("Exchange hashpartitioning(o_orderkey"),
        "bucketed side should not re-shuffle")
      assert(joined.collect().map(_.getAs[Long]("n")).sum > 0)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS orders_b")
      spark.sql("DROP TABLE IF EXISTS lineitem_b")
    }
  }
}
