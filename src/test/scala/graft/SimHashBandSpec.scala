package graft

import org.apache.spark.sql.functions._

import graft.queries.Dedup

/** Band-width parameterization invariants for the simhash pair path:
  * any legal setting with ≥ maxHamming+1 bands must find the IDENTICAL
  * verified pair set (pigeonhole guarantees every true pair collides
  * on ≥1 band; the exact bit_count verify removes every false
  * candidate), narrower widths only cost more candidates. Wider bands
  * shrink the guaranteed radius — the contract the require() enforces.
  */
class SimHashBandSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private def canon(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq

  test("verified pairs are band-width invariant while pigeonhole holds") {
    val gate = canon(Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 15, 3))
    assert(canon(Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 12, 3)) === gate)
    assert(canon(Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 10, 3)) === gate)
    // the map-entry wrapper IS the 15-bit gate setting
    assert(canon(Dedup.simhashPairs(spark, d, Int.MaxValue)) === gate)
  }

  test("20-bit bands guarantee only hamming <= 2, and match the all-pairs truth there") {
    import spark.implicits._
    val wide = Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 20, 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    // direct all-pairs hamming <= 2 over the same signatures
    val sig = Dedup.queries("d_simhash")(spark, d).select("doc_id", "simhash")
    val truth = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
      .filter(expr("bit_count(a.simhash ^ b.simhash)") <= 2)
      .select(col("a.doc_id"), col("b.doc_id")).as[(Long, Long)].collect().toSet
    assert(wide === truth)
  }

  test("narrower bands produce at least as many candidates") {
    val c15 = Dedup.simhashCandidateCount(spark, d, Int.MaxValue, 15)
    val c10 = Dedup.simhashCandidateCount(spark, d, Int.MaxValue, 10)
    val c20 = Dedup.simhashCandidateCount(spark, d, Int.MaxValue, 20)
    assert(c10 >= c15 && c15 >= c20)
  }

  test("illegal settings are rejected: non-divisor width, radius beyond pigeonhole") {
    intercept[IllegalArgumentException](
      Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 13, 3))
    intercept[IllegalArgumentException](
      Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 20, 3))
    intercept[IllegalArgumentException](
      Dedup.simhashPairsBanded(spark, d, Int.MaxValue, 30, 1))
  }
}
