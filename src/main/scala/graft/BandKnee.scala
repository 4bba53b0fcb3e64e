package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.Dedup

/** SimHash band-saturation measurement: for each corpus dir given on
  * the command line, count candidate pairs (the pre-verify volume that
  * drives the join cost) and verified pairs at each legal band width
  * over the 60-bit signature. `runMain graft.BandKnee <dir> [dir…]` →
  * one JSON line, also written to `SPARK_GRAFT_KNEE_OUT` (default
  * `BENCH_simhash_bands.json`).
  *
  * Collisions between random signatures scale ~ bands · n² / 2^(bandBits+1),
  * so candidates explode when n approaches 2^bandBits — the knee this
  * artifact locates empirically (SURVEY §9.12 interprets it). Wider
  * bands (20 bits → 3 bands) suppress collisions but shrink the
  * guaranteed radius to hamming ≤ 2; the hamming ≤ 3 contract at
  * larger n needs a wider signature, not wider bands over 60 bits.
  */
object BandKnee {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: BandKnee <sfDir> [sfDir…]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_KNEE_OUT", "BENCH_simhash_bands.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val cap = Int.MaxValue // measure raw saturation, not the capped production view
    val dirJsons = args.map { d =>
      val nDocs = Tables.documents(spark, d).count()
      val settings = Seq(10, 12, 15, 20).map { bits =>
        val bands = 60 / bits
        val maxHamming = bands - 1
        val cands = Dedup.simhashCandidateCount(spark, d, cap, bits)
        val pairs = Dedup.simhashPairsBanded(spark, d, cap, bits,
          math.min(3, maxHamming)).count()
        s""""$bits":{"bands":$bands,"guaranteed_hamming":$maxHamming,""" +
          s""""candidates":$cands,"verified_pairs":$pairs}"""
      }.mkString("{", ",", "}")
      s""""$d":{"docs":$nDocs,"band_bits":$settings}"""
    }.mkString("{", ",", "}")
    val json = s"""{"uncapped":true,"hamming_contract":3,"dirs":$dirJsons}"""
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[band-knee] write $outPath failed: $e") }
    println(json)
    spark.stop()
  }
}
