package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.queries.{DigestIndex, IndexMaintenance, MinhashIndex}
import graft.util.Par

/** Contract of the concurrent append barrier (`[scale]
  * parallel_appends` → [[graft.util.Par.join]]): parallel submission
  * of distinct indexes' appends is semantics-preserving (probes equal
  * the sequential path), the join awaits EVERY thunk before returning
  * or rethrowing, and the first failure propagates. */
class ParAppendSpec extends SparkSuite {

  import spark.implicits._

  private def docs(ids: Long*) =
    ids.map(i => (i, s"doc number $i body word$i tail")).toDF("doc_id", "text")

  test("parallel appends to distinct indexes == sequential appends (probe-equal)") {
    val corpus = docs(1L, 2L, 3L)
    val delta = docs(10L, 20L)
    val probe = docs(10L, 20L, 30L)

    def buildAppendProbe(tag: String, parallel: Boolean) = {
      val dg = DigestIndex.fresh(spark, s"parspec-dg-$tag", corpus)
      val mh = MinhashIndex.fresh(spark, s"parspec-mh-$tag", corpus)
      try {
        Par.join(parallel)(
          () => { dg.append(delta); () },
          () => { mh.append(delta); () })
        val dgRows = dg.probe(probe).orderBy(col("doc_id")).collect()
          .map(r => (r.getLong(0), r.getBoolean(2))).toSeq
        val mhRows = mh.probe(probe).orderBy(col("doc_id")).collect()
          .map(r => (r.getLong(0),
            if (r.isNullAt(1)) -1L else r.getLong(1),
            r.getBoolean(3))).toSeq
        (dgRows, mhRows)
      } finally { dg.drop(); mh.drop() }
    }

    val seq = buildAppendProbe("seq", parallel = false)
    val par = buildAppendProbe("par", parallel = true)
    assert(par == seq)
    assert(seq._1.nonEmpty)
  }

  test("join runs every thunk exactly once, parallel and sequential") {
    for (parallel <- Seq(true, false)) {
      val n = new AtomicInteger(0)
      Par.join(parallel)((1 to 5).map(_ => () => { n.incrementAndGet(); () }): _*)
      assert(n.get() == 5)
    }
  }

  test("a failing thunk propagates AFTER every sibling completed") {
    val done = new AtomicInteger(0)
    val e = intercept[IllegalStateException] {
      Par.join(parallel = true)(
        () => throw new IllegalStateException("boom"),
        () => { Thread.sleep(50); done.incrementAndGet(); () },
        () => { Thread.sleep(50); done.incrementAndGet(); () })
    }
    assert(e.getMessage == "boom")
    // the join barrier awaited the slow siblings before rethrowing —
    // no append job is still in flight when the caller's finally runs
    assert(done.get() == 2)
  }

  test("the [scale] knob reaches the flag") {
    val before = IndexMaintenance.parallelAppends
    try {
      IndexMaintenance.configure(graft.config.EngineConfig(
        scale = graft.config.ScaleConfig(parallelAppends = false)))
      assert(!IndexMaintenance.parallelAppends)
      IndexMaintenance.configure(graft.config.EngineConfig(
        scale = graft.config.ScaleConfig(parallelAppends = true)))
      assert(IndexMaintenance.parallelAppends)
    } finally IndexMaintenance.parallelAppends = before
  }
}
