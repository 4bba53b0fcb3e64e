package graft

import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.queries.{CorpusClean, EvolveServe, IvfIndex}
import graft.search.PostingsIndex

/** The serving-while-evolving closure's library contract: after each
  * batch's append, the BRANCH state must answer exactly like a FRESH
  * pair of indexes built on the accumulated corpus — the end-to-end
  * consumer of the PostingsIndex branch BM25-stats-merge claim and the
  * IvfIndex frozen-centroid append claim (each previously pinned only
  * in isolation by PostingsAppendSpec / IvfAppendSpec). Value parity
  * vs DuckDB is the `pipe_incr_evolve_serve` gate's job; this spec
  * pins branch ≡ rebuild inside Spark, where the oracle can't
  * distinguish which side drifted.
  */
class EvolveServeSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getDouble(4), r.getInt(5))).toSeq.sorted

  test("each between-batch answer == a fresh rebuild on the accumulated corpus") {
    val k = CorpusClean.EvolveBatches
    val run = java.util.UUID.randomUUID().toString.take(8)
    val out = SparkEntry.queries("pipe_incr_evolve_serve")(spark, d)
    val byBatch = rows(out).groupBy(_._1)
    assert(byBatch.keySet == (0L until k.toLong).toSet, s"one group per batch")

    val docs = Tables.documents(spark, d)
    def normalized(pred: org.apache.spark.sql.Column) =
      Tables.embeddings(spark, d).filter(pred)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
        .withColumn("nrm", sqrt(VectorOps.norm2(col("v0"))))
        .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))

    for (b <- 0 until k) {
      // Fresh postings over corpus ∪ delta batches ≤ b.
      val visible = pmod(col("doc_id"), lit(10)) =!= 0 ||
        pmod(col("doc_id"), lit(10L * k)) <= lit(10L * b)
      val freshPo = PostingsIndex.of(
        docs.filter(visible).select(col("doc_id"), col("text")),
        "doc_id", "text", s"evsrv_${b}_$run")
      // Fresh IVF on the cohort (same seed rule), delta appended in one
      // go under the frozen cohort centroids.
      var freshIv = IvfIndex.fresh(spark, s"evsrv_iv_${b}_$run",
        normalized(pmod(col("vec_id"), lit(10)) =!= 0),
        numCentroids = 16, iters = 2, quantScale = 1000000.0)
      try {
        freshIv = freshIv.append(normalized(
          pmod(col("vec_id"), lit(10)) === 0 &&
            pmod(col("vec_id"), lit(10L * k)) <= lit(10L * b)))
        val fresh = rows(EvolveServe.serveAnswers(b, freshPo, freshIv))
        assert(fresh == byBatch(b.toLong),
          s"batch $b: branch answers != fresh-rebuild answers")
      } finally { freshPo.drop(); freshIv.drop() }
    }
  }

  test("clean+serve: a rejected duplicate is never retrievable; accepted docs are") {
    // The r12 VERDICT #3 contract, pinned on a constructed scenario:
    // the delta plants an EXACT DUP of a term-rich corpus doc (it
    // would rank at the top of both BM25 and ANN if it were appended —
    // the corpus is small enough that top-10 covers everything) plus a
    // unique accepted doc. After the ledger gates the appends, the
    // serving branches must retrieve the accepted doc and the dup's
    // corpus twin, and must NOT retrieve the rejected dup — by id, not
    // by rank luck.
    import spark.implicits._
    import graft.queries.{DigestIndex, MinhashIndex}
    graft.functions.DotProduct.register(spark)
    val run = java.util.UUID.randomUUID().toString.take(8)
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    val richText = "spark join fast table spark join fast table the of"
    val corpusDocs = ((1L, richText) +: (2L to 8L).map(i =>
      (i, s"filler$i words about nothing much the a of and is here"))).toDF("doc_id", "text")
    val corpusVecs = (1L to 8L).map(i => (i, oneHot((i % 8).toInt))).toDF("vec_id", "v")
    val dg = DigestIndex.fresh(spark, s"cs_dg_$run", corpusDocs)
    val mh = MinhashIndex.fresh(spark, s"cs_mh_$run", corpusDocs)
    val poBase = graft.search.PostingsIndex.of(corpusDocs, "doc_id", "text", s"cs_po_$run")
    val ivBase = IvfIndex.fresh(spark, s"cs_iv_$run", corpusVecs,
      numCentroids = 2, iters = 1, quantScale = 1000000.0)
    var po = poBase.branch()
    val iv = ivBase.branch()
    try {
      val delta = Seq(
        (100L, richText), // exact dup of corpus doc 1 → rejected
        (101L, "spark join fast table unique fresh angle the a of and is wide"))
        .toDF("doc_id", "text")
      val deltaVecs = Seq(
        (100L, oneHot(1)), // duplicate direction of corpus vec 1
        (101L, Seq.tabulate(64)(j => if (j < 4) 0.5 else 0.0)))
        .toDF("vec_id", "v")
      val ledger = CorpusClean.incrLedger(spark, delta, dg, mh).localCheckpoint()
      val verdicts = ledger.select(col("doc_id"), col("reason")).collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(verdicts(100L) == "exact_dup" && verdicts(101L) == "kept", s"$verdicts")
      val acceptedIds = ledger.filter(col("keep")).select(col("doc_id"))
      po = po.append(delta.join(acceptedIds, "doc_id")
        .select(col("doc_id"), col("text")), "doc_id", "text")
      iv.append(deltaVecs.join(
        acceptedIds.select(col("doc_id").as("vec_id")), Seq("vec_id"), "left_semi"))
      val answers = EvolveServe.serveAnswers(0, po, iv, "vec_id = 2").collect()
      val bmDocs = answers.filter(_.getString(1) == "bm25").map(_.getLong(3)).toSet
      val annDocs = answers.filter(_.getString(1) == "ann").map(_.getLong(3)).toSet
      assert(!bmDocs.contains(100L), s"rejected dup retrievable via BM25: $bmDocs")
      assert(bmDocs.contains(101L), s"accepted term-rich doc must be retrievable: $bmDocs")
      assert(bmDocs.contains(1L), s"the dup's corpus twin stays retrievable: $bmDocs")
      assert(!annDocs.contains(100L), s"rejected dup's vector retrievable via ANN: $annDocs")
      assert(annDocs.contains(101L), s"accepted vector must be probe-visible: $annDocs")
    } finally { po.drop(); iv.drop(); dg.drop(); mh.drop(); ivBase.drop() }
  }

  test("clean+serve answers == fresh rebuilds over the kept-set closure") {
    val k = CorpusClean.EvolveBatches
    val run = java.util.UUID.randomUUID().toString.take(8)
    val out = SparkEntry.queries("pipe_incr_clean_serve")(spark, d)
    val byBatch = rows(out).groupBy(_._1)
    assert(byBatch.keySet == (0L until k.toLong).toSet, "one group per batch")
    // The kept-set closure IS the already-gated evolve_embed ledger
    // (same 5-stage semantics, same batching) — reuse its verdicts as
    // the per-batch visibility truth.
    val kept = SparkEntry.queries("pipe_incr_evolve_embed")(spark, d)
      .filter(col("keep")).select(col("doc_id"), col("batch")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val docs = Tables.documents(spark, d)
    def normalized(pred: org.apache.spark.sql.Column) =
      Tables.embeddings(spark, d).filter(pred)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
        .withColumn("nrm", sqrt(VectorOps.norm2(col("v0"))))
        .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
    for (b <- 0 until k) {
      val keptIds = kept.filter(_._2 <= b).map(_._1).toSeq.sorted
      val visible = pmod(col("doc_id"), lit(10)) =!= 0 ||
        col("doc_id").isin(keptIds: _*)
      val freshPo = PostingsIndex.of(
        docs.filter(visible).select(col("doc_id"), col("text")),
        "doc_id", "text", s"cssrv_${b}_$run")
      var freshIv = IvfIndex.fresh(spark, s"cssrv_iv_${b}_$run",
        normalized(pmod(col("vec_id"), lit(10)) =!= 0),
        numCentroids = 16, iters = 2, quantScale = 1000000.0)
      try {
        freshIv = freshIv.append(normalized(
          pmod(col("vec_id"), lit(10)) === 0 && col("vec_id").isin(keptIds: _*)))
        val fresh = rows(EvolveServe.serveAnswers(b, freshPo, freshIv,
          EvolveServe.CleanServeAnnPred))
        assert(fresh == byBatch(b.toLong),
          s"batch $b: clean+serve answers != kept-set fresh-rebuild answers")
      } finally { freshPo.drop(); freshIv.drop() }
    }
  }

  test("the serve closure leaves no branch tables or checkpoints behind") {
    // Shared base indexes legitimately persist (of() cache) — force
    // them FIRST so the run's delta is attributable to the closure.
    EvolveServe.servePostings(spark, d)
    EvolveServe.serveIvf(spark, d)
    val tablesBefore = spark.catalog.listTables().count()
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    SparkEntry.queries("pipe_incr_evolve_serve")(spark, d).collect()
    assert(spark.catalog.listTables().count() == tablesBefore,
      "branch overlays must be dropped")
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    // the K part checkpoints the returned frame reads are the only
    // allowed survivors; collect() consumed them above, but they stay
    // cached until unpersisted — sweep for the next test and assert
    // nothing ELSE leaked.
    assert(leftover.size <= CorpusClean.EvolveBatches,
      s"only the K part frames may survive: $leftover")
    leftover.foreach(id =>
      spark.sparkContext.getPersistentRDDs.get(id).foreach(_.unpersist(blocking = false)))
  }
}
