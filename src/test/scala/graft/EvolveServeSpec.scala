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
