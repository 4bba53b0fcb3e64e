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

  test("overlapping scopes merge: an exiting scope never sweeps another's in-flight blocks") {
    // r10 ADVICE: before the merge, a scope exiting while another was
    // in flight unpersisted every block the OTHER scope had created
    // since the exiter's baseline — unrecoverable for local
    // checkpoints. Interleaving forced with latches: main enters its
    // scope FIRST (so the worker's block is not in main's baseline),
    // the worker checkpoints, main exits, and the worker must still be
    // able to compute from its block.
    import java.util.concurrent.{CountDownLatch, TimeUnit}
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val mainEntered = new CountDownLatch(1)
    val blockMade = new CountDownLatch(1)
    val mainExited = new CountDownLatch(1)
    @volatile var workerOk = false
    @volatile var workerErr: Throwable = null
    val worker = new Thread(() => {
      try {
        mainEntered.await(30, TimeUnit.SECONDS)
        CheckpointHygiene.scoped(spark) {
          val f = spark.range(100).toDF("x").localCheckpoint()
          blockMade.countDown()
          mainExited.await(30, TimeUnit.SECONDS)
          workerOk = f.count() == 100 // throws if the block was swept
        }
      } catch { case t: Throwable => workerErr = t; blockMade.countDown() }
    })
    worker.start()
    CheckpointHygiene.scoped(spark) {
      mainEntered.countDown()
      assert(blockMade.await(30, TimeUnit.SECONDS))
    }
    mainExited.countDown()
    worker.join(30000)
    assert(workerErr == null, s"worker failed: $workerErr")
    assert(workerOk, "the worker's in-flight checkpoint must survive main's scope exit")
    // and once ALL scopes exited, the merged sweep reclaimed everything
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(leftover.isEmpty, s"merged sweep must reclaim all scope blocks: $leftover")
  }

  // r11 ADVICE/VERDICT: the serve tier is a session-sharing entry point,
  // so a dispatch must be a scope member, not an unprotected bystander
  // whose in-flight blocks a racing bench/stream scope's exit would
  // sweep (unrecoverable — local checkpoints cannot be recomputed).

  private lazy val engine =
    graft.api.Engine.fromManifest(spark, fixturePath("manifest.json"))

  test("a serve dispatch runs inside a checkpoint scope") {
    // refresh_index re-ingests (several Spark jobs) — long enough for
    // the main thread to observe the dispatch's scope being open.
    assert(CheckpointHygiene.activeDepth(spark) == 0, "no scope open at entry")
    @volatile var res: Any = null
    val t = new Thread(() => {
      res = graft.serve.JsonLineServer.dispatch(engine, Map("tool" -> "refresh_index"))
    })
    var seenOpen = false
    t.start()
    while (t.isAlive) {
      if (CheckpointHygiene.activeDepth(spark) > 0) seenOpen = true
      Thread.sleep(2)
    }
    t.join(30000)
    assert(res == Map("status" -> "ok"))
    assert(seenOpen, "dispatch must hold an open CheckpointHygiene scope while it runs")
    assert(CheckpointHygiene.activeDepth(spark) == 0, "the dispatch's scope must close")
  }

  test("a dispatch racing an open scope merges: neither side sweeps the other") {
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    CheckpointHygiene.scoped(spark) {
      val f = spark.range(50).toDF("x").localCheckpoint()
      @volatile var err: Throwable = null
      val t = new Thread(() => {
        try graft.serve.JsonLineServer.dispatch(engine,
          Map("tool" -> "search_models", "args" -> Map("query" -> "orders")))
        catch { case e: Throwable => err = e }
      })
      t.start(); t.join(60000)
      assert(err == null, s"racing dispatch failed: $err")
      // pre-merge semantics would have let the dispatch's scope exit
      // unpersist our in-flight block (created after its baseline)
      assert(f.count() == 50,
        "the dispatch's scope exit must not sweep a concurrent scope's in-flight block")
    }
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(leftover.isEmpty, s"outermost exit reclaims everything: $leftover")
  }
}
