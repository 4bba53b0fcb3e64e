package graft

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.functions._

import graft.queries.IndexMaintenance
import graft.search.PostingsIndex
import graft.util.Par

/** Contract of the r15 `[scale] pipeline_overlap` optimizations:
  * upfront concurrent batch derivation + serve-answer/next-ledger
  * overlap are FRAME-IDENTICAL to the serialized path (the knob only
  * reorders job submission of provably independent stages), the
  * pre-derived postings append path equals the classic text append,
  * and the [[Par.async]] one-sided barrier keeps join-and-rethrow
  * semantics.
  */
class PipelineOverlapSpec extends SparkSuite {

  import spark.implicits._

  private val d = "/root/testdata/sf0.001"

  test("cleanServe: pipeline_overlap on == off (row-identical answers)") {
    val before = IndexMaintenance.pipelineOverlap
    def run(): Seq[String] =
      SparkEntry.queries("pipe_incr_clean_serve")(spark, d)
        .collect().map(_.toString).toSeq
    try {
      IndexMaintenance.pipelineOverlap = false
      val serial = run()
      IndexMaintenance.pipelineOverlap = true
      val overlapped = run()
      assert(serial.nonEmpty)
      assert(overlapped == serial,
        "overlapped clean+serve answers differ from the serialized path")
    } finally IndexMaintenance.pipelineOverlap = before
  }

  test("postings appendDerived(pre-derived semi-join) == append(filtered docs)") {
    val corpus = Seq((1L, "alpha beta gamma"), (2L, "beta delta"))
      .toDF("doc_id", "text")
    val batch = Seq((10L, "alpha alpha epsilon"), (20L, "zeta beta"),
      (30L, "rejected doc body")).toDF("doc_id", "text")
    val accepted = Seq(10L, 20L).toDF("doc")
    val run = java.util.UUID.randomUUID().toString.take(8)

    def scores(po: PostingsIndex): Seq[(Long, Double)] =
      po.score(Seq("alpha", "beta")).orderBy(col("doc"))
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq

    val classic = PostingsIndex.of(corpus, "doc_id", "text", s"ovl-classic-$run")
      .append(batch.filter(col("doc_id") =!= 30L), "doc_id", "text")
    // The pre-derived path: full-batch postings rows derived first
    // (index-state-independent), accepted ids semi-joined after — the
    // per-doc rows make the filter commute with the derivation.
    val derivedIdx = PostingsIndex.of(corpus, "doc_id", "text", s"ovl-derived-$run")
    val preDerived = derivedIdx.deriveRows(batch, "doc_id", "text")
    Par.materialize(parallel = true)(preDerived)
    val derived = derivedIdx.appendDerived(
      preDerived.join(accepted, Seq("doc"), "left_semi"))
    try {
      val c = scores(classic)
      assert(c.map(_._1) == Seq(1L, 2L, 10L, 20L))
      assert(scores(derived) == c, "pre-derived append drifted from classic append")
    } finally { classic.drop(); derived.drop() }
  }

  test("async: sync mode runs inline; parallel mode joins and rethrows") {
    val n = new AtomicInteger(0)
    val h = Par.async(parallel = false)(() => { n.incrementAndGet(); () })
    assert(n.get() == 1, "sync async must run before returning")
    h.await() // no-op handle

    val h2 = Par.async(parallel = true)(() => { Thread.sleep(30); n.incrementAndGet(); () })
    h2.await()
    assert(n.get() == 2)
    h2.await() // idempotent

    val h3 = Par.async(parallel = true)(() => throw new IllegalStateException("boom"))
    val e = intercept[IllegalStateException](h3.await())
    assert(e.getMessage == "boom")
    h3.awaitQuietly() // quiet join never throws
  }

  test("the [scale] knob reaches the flag") {
    val before = IndexMaintenance.pipelineOverlap
    try {
      IndexMaintenance.configure(graft.config.EngineConfig(
        scale = graft.config.ScaleConfig(pipelineOverlap = false)))
      assert(!IndexMaintenance.pipelineOverlap)
      IndexMaintenance.configure(graft.config.EngineConfig(
        scale = graft.config.ScaleConfig(pipelineOverlap = true)))
      assert(IndexMaintenance.pipelineOverlap)
    } finally IndexMaintenance.pipelineOverlap = before
  }
}
