package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum, when}

import graft.queries.Dedup

/** Embedding sign-band saturation measurement — the [[BandKnee]] twin
  * for the `d_embed_lsh_pairs` family: for each corpus dir given on
  * the command line, count candidate pairs (the pre-verify volume that
  * drives the self-join cost), verified pairs, and the wall-clock of
  * the full pipeline at each legal band width over the 64-dim
  * normalized vectors. `runMain graft.EmbedBandKnee <dir> [dir…]` →
  * one JSON line, also written to `SPARK_GRAFT_KNEE_OUT` (default
  * `BENCH_embed_bands.json`).
  *
  * Collisions between UNrelated vectors scale ~ groups · n² / 2^bandBits
  * (sign bits of independent dims are ~fair coins after L2 norm), so
  * 8-bit keys saturate as n approaches ~2⁸ per key — the knee this
  * artifact locates empirically; near-identical pairs (the ones the
  * 0.45-cosine verify keeps) agree on nearly every sign, so widening
  * bands sheds candidates without shedding recall (BandCapSpec pins
  * pair-set equality across widths at test scale). SURVEY §9.12
  * interprets the curve against the ×64 `d_embed_lsh_pairs` row.
  */
object EmbedBandKnee {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EmbedBandKnee <sfDir> [sfDir…]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_KNEE_OUT", "BENCH_embed_bands.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Per-measurement orphan sweep (blocking, outside the timed window)
    // — the packaged Bench discipline.
    def swept[T](body: => T): (T, Double) =
      graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
        val t0 = System.nanoTime()
        val n = body
        (n, (System.nanoTime() - t0) / 1e9)
      }

    // Pair counts sliced by cosine tier — recall of banded sign-LSH is
    // a function of the pair's cosine (a 0.45 pair flips ~35% of sign
    // bits, a 0.9+ near-dup a few percent), so one overall recall
    // number misleads in both directions: the DEDUP tier (≥ 0.9)
    // recalls near-totally at settings whose overall recall reads a
    // few percent on a borderline-heavy corpus. One aggregation pass
    // over the pair frame (no second pipeline run).
    def tiered(pairs: DataFrame): (Long, Long, Long) = {
      val r = pairs.agg(count(lit(1)),
        sum(when(col("cosine") >= 0.70, 1L).otherwise(0L)),
        sum(when(col("cosine") >= 0.90, 1L).otherwise(0L))).collect().head
      (r.getLong(0),
        if (r.isNullAt(1)) 0L else r.getLong(1),
        if (r.isNullAt(2)) 0L else r.getLong(2))
    }

    val cap = Dedup.MaxBandSize // the production view: hot keys capped as the gate runs
    val dirJsons = args.map { d =>
      val nVecs = Tables.embeddings(spark, d).count()
      val settings = Seq(8, 16, 32).map { bits =>
        val (cands, candSec) = swept(Dedup.embedLshCandCount(spark, d, cap, bits))
        val (pairs, pairSec) = swept(
          Dedup.embedLshPairs(spark, d, cap, bits).queryExecution.toRdd.count())
        System.err.println(
          s"[embed-knee] $d bits=$bits cands=$cands (${f(candSec)}s) " +
            s"pairs=$pairs (${f(pairSec)}s)")
        s""""$bits":{"groups":${64 / bits},"candidates":$cands,""" +
          s""""cand_sec":${f(candSec)},"verified_pairs":$pairs,""" +
          s""""pipeline_sec":${f(pairSec)}}"""
      }.mkString("{", ",", "}")
      // Multi-probe recall FRONTIER (r10 VERDICT #4): rotations recover
      // the loose-cosine pairs single-probe misses (8-bit), and
      // compensate a width that saturates nothing (16-bit at 100k+
      // vectors). TRUE recall against the brute-force ground truth —
      // the O(n²) denominator runs the codegen dot inside a broadcast
      // nested-loop join, measured ~60 s at 128k vectors (8.2×10⁹
      // pairs), so it is computable at every dir this main is pointed
      // at; the cap is an escape hatch for far larger corpora (above
      // it the artifact records recall: null, honestly labeled).
      // Recall is reported overall AND by cosine tier (≥0.7, ≥0.9):
      // sign-LSH recall is a function of the pair's cosine, and the
      // dedup tier (≥0.9) is the one the cleaning ledgers act on.
      val truthMax = sys.env.getOrElse("SPARK_GRAFT_KNEE_TRUTH_MAX", "130000").toLong
      val haveTruth = nVecs <= truthMax
      val ((truePairs, true70, true90), truthSec) =
        if (haveTruth) swept(tiered(Dedup.embedTruePairs(spark, d)))
        else ((0L, 0L, 0L), 0.0)
      System.err.println(if (haveTruth)
        s"[embed-knee] $d TRUE pairs=$truePairs hi70=$true70 hi90=$true90 " +
          s"(${f(truthSec)}s, brute force)"
      else s"[embed-knee] $d truth skipped ($nVecs vectors > cap $truthMax)")
      // A zero denominator means the tier was NOT measured on this
      // corpus (e.g. hi90 on the shipped synthetics, which hold no
      // ≥0.9 pairs) — record null, never a vacuous 1.000 a reader
      // could mistake for measured-perfect recall.
      def recallStr(n: Long, denom: Long): String =
        if (!haveTruth || denom == 0) "null"
        else f(n.toDouble / denom)
      val multi = (for {
        bits <- Seq(8, 16)
        r <- Seq(1, 2, 4, 8, 16)
      } yield {
        val (cands, candSec) = swept(
          Dedup.embedLshCandCountMulti(spark, d, cap, bits, r))
        val ((pairs, p70, p90), sec) = swept(
          tiered(Dedup.embedLshPairsMulti(spark, d, cap, bits, r)))
        val recall = recallStr(pairs, truePairs)
        val recall90 = recallStr(p90, true90)
        System.err.println(
          s"[embed-knee] $d bits=$bits R=$r cands=$cands (${f(candSec)}s) " +
            s"pairs=$pairs recall=$recall recall_hi90=$recall90 (${f(sec)}s)")
        s""""${bits}x$r":{"band_bits":$bits,"rotations":$r,""" +
          s""""candidates":$cands,"cand_sec":${f(candSec)},""" +
          s""""verified_pairs":$pairs,"recall":$recall,""" +
          s""""verified_hi70":$p70,"recall_hi70":${recallStr(p70, true70)},""" +
          s""""verified_hi90":$p90,"recall_hi90":$recall90,""" +
          s""""pipeline_sec":${f(sec)}}"""
      }).mkString("{", ",", "}")
      s""""$d":{"vectors":$nVecs,""" +
        (if (haveTruth)
          s""""true_pairs":$truePairs,"true_hi70":$true70,"true_hi90":$true90,""" +
            s""""truth_sec":${f(truthSec)},"""
         else """"true_pairs":null,""") +
        s""""band_bits":$settings,"multiprobe":$multi}"""
    }.mkString("{", ",", "}")
    val json = s"""{"cap":$cap,"cosine_threshold":0.45,"dirs":$dirJsons}"""
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[embed-knee] write $outPath failed: $e") }
    println(json)
    spark.stop()
  }

  private def f(v: Double) = f"$v%.3f"
}
