package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.{Ann, Dedup, IvfIndex}

/** The IVF-assisted embedding pair route (`d_embed_neardup_ivf`).
  *
  * Round 12 rewrote [[Ann.embedPairsIvf]]'s verify from
  * dedup-pair-ids-then-attach-vectors (two CANDIDATE-sized
  * vector-carrying shuffles — ~400 GB of spill at ×64 P=4) to
  * bucket-local: vectors attach ONCE by vec_id (corpus-sized), the
  * exact dot runs inside the bucket self-join's output, and pair
  * dedup happens on the threshold SURVIVORS. This spec pins the
  * rewrite's contract: the result is row-identical to the reference
  * shape (candidates → distinct pair ids → attach vectors → dot →
  * filter) — permissible because `graft_dot` is a deterministic
  * left-to-right fold, so a pair meeting in several buckets carries
  * bit-identical cosines into the survivor-level distinct. */
class EmbedIvfRouteSpec extends SparkSuite {

  private def normalized(d: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
  }

  /** The pre-rewrite shape, kept here as the reference: attach both
    * vectors to the DEDUPED candidate pair ids, then verify. */
  private def referencePairs(idx: IvfIndex.Index, probe: Int): DataFrame = {
    val e = idx.assigned.select(col("vec_id"), col("v"))
    Ann.embedIvfCands(idx, probe)
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), expr("graft_dot(va, vb)").as("cosine"))
      .filter(col("cosine") >= Dedup.EmbedCosineThreshold)
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Double)] =
    df.select("vec_a", "vec_b", "cosine").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet

  test("bucket-local verify == dedup-then-attach reference, P = 1 / 2 / 4") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val idx = IvfIndex.of(spark, s"ivf_route_$run", e,
      numCentroids = 4, iters = 2, quantScale = 1000000.0)
    for (p <- Seq(1, 2, 4)) {
      val got = asSet(Ann.embedPairsIvf(idx, p))
      val want = asSet(referencePairs(idx, p))
      assert(got == want, s"P=$p: ${got.size} vs ${want.size} pairs")
      // every pair appears exactly once despite multi-bucket meetings
      val ids = Ann.embedPairsIvf(idx, p).select("vec_a", "vec_b").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      assert(ids.length == ids.distinct.length, s"P=$p: duplicate pairs")
    }
  }

  test("pair sets grow monotonically in P and stay ordered a < b") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val idx = IvfIndex.of(spark, s"ivf_route_m_$run", e,
      numCentroids = 4, iters = 2, quantScale = 1000000.0)
    val byP = Seq(1, 2, 4).map(p => p -> asSet(Ann.embedPairsIvf(idx, p))).toMap
    assert(byP(1).subsetOf(byP(2)), "P=1 pairs must survive P=2")
    assert(byP(2).subsetOf(byP(4)), "P=2 pairs must survive P=4")
    byP(4).foreach { case (a, b, _) => assert(a < b, s"unordered pair ($a,$b)") }
  }
}
