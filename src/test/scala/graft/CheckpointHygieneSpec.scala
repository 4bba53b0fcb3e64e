package graft

import graft.util.CheckpointHygiene

/** The library-caller checkpoint contract (r9 ADVICE): query bodies
  * checkpoint shared intermediates that feed the returned lazy frame,
  * so the library cannot free them — a long-lived caller wraps each
  * fully-materializing invocation in [[CheckpointHygiene.scoped]] and
  * the session's persisted-block set returns to its baseline. */
class CheckpointHygieneSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("scoped frees every checkpoint a materialized invocation created") {
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val rows = CheckpointHygiene.scoped(spark) {
      SparkEntry.queries("d_exact_dedup")(spark, d).collect()
    }
    assert(rows.nonEmpty)
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(leftover.isEmpty,
      s"d_exact_dedup's digest checkpoint must not outlive the scope: $leftover")
  }

  test("scoped returns the body's value and frees on exception too") {
    assert(CheckpointHygiene.scoped(spark)(41 + 1) == 42)
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    intercept[RuntimeException] {
      CheckpointHygiene.scoped(spark) {
        SparkEntry.queries("d_exact_dedup")(spark, d).collect()
        throw new RuntimeException("boom")
      }
    }
    assert((spark.sparkContext.getPersistentRDDs.keySet -- baseline).isEmpty)
  }

  test("long-lived frames persisted BEFORE the scope are untouched") {
    val kept = spark.range(10).toDF("x").localCheckpoint()
    val id = kept.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.id
    }.head
    CheckpointHygiene.scoped(spark) {
      SparkEntry.queries("d_exact_dedup")(spark, d).collect()
    }
    assert(spark.sparkContext.getPersistentRDDs.contains(id),
      "baseline blocks survive the scope")
    assert(kept.count() == 10)
    spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false))
  }
}
