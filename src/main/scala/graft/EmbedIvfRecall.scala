package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, count, lit, sum, when}

import graft.queries.{Ann, Dedup, IvfIndex}

/** Recall/cost measurement for the IVF-assisted embedding pair route
  * (`d_embed_neardup_ivf`) — the mid-tier (cosine 0.45–0.7) companion
  * to [[EmbedBandKnee]]'s sign-band frontier: sign-LSH recalls a few
  * percent of mid-tier pairs at production width (a 0.45–0.7 pair
  * flips ~35% of sign bits), while vectors at that tier still land
  * near each other in CENTROID space — so shared-top-P-IVF-bucket
  * candidates are the recall path that tier gets.
  *
  * For each corpus dir this main SWEEPS the centroid-count sizing
  * (r12 VERDICT #1 — the weak row): √n (the r12 rule, under which
  * candidate volume grows ~n^1.5 and recall FELL with n: 89.6 → 58.4
  * → 39.7 % at 2k/20k/128k) against the flat-bucket rules n/512 and
  * n/256 (centroids ∝ n ⇒ expected bucket size B stays flat ⇒
  * candidates ≈ n·B·P²/2 stay LINEAR in n — the sizing a 100 TB
  * deployment needs). Per sizing × P = 1/2/4: candidate count (the
  * pre-verify cost driver), verified pairs, and TRUE recall per
  * cosine tier against the brute-force all-pairs denominator. The
  * committed production rule lives in SURVEY §9.12 and the
  * `[scale] ivf_pair_bucket` knob ([[graft.queries.ScaleOps
  * .embedNearDupIvf]]); the gate's 16-centroid setting stays the
  * oracle-checkable point, not the scale point.
  *
  *   sbt "runMain graft.EmbedIvfRecall /root/testdata/sf0.1 target/scale_x10"
  *
  * One JSON line to stdout and `SPARK_GRAFT_IVF_RECALL_OUT` (default
  * `BENCH_embed_ivf.json`). SURVEY §9.12 interprets the rows next to
  * the sign-band frontier.
  */
object EmbedIvfRecall {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: EmbedIvfRecall <sfDir> [sfDir…]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_IVF_RECALL_OUT", "BENCH_embed_ivf.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def swept[T](body: => T): (T, Double) =
      graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
        val t0 = System.nanoTime()
        val n = body
        (n, (System.nanoTime() - t0) / 1e9)
      }

    // (total ≥0.45, mid [0.45,0.7), hi70 ≥0.7, hi90 ≥0.9) in one pass.
    def tiered(pairs: DataFrame): (Long, Long, Long, Long) = {
      val r = pairs.agg(count(lit(1)),
        sum(when(col("cosine") < 0.70, 1L).otherwise(0L)),
        sum(when(col("cosine") >= 0.70, 1L).otherwise(0L)),
        sum(when(col("cosine") >= 0.90, 1L).otherwise(0L))).collect().head
      def g(i: Int) = if (r.isNullAt(i)) 0L else r.getLong(i)
      (r.getLong(0), g(1), g(2), g(3))
    }
    def recallStr(n: Long, denom: Long): String =
      if (denom == 0) "null" else f(n.toDouble / denom)

    // Accumulate per-dir JSON and REWRITE the artifact after every
    // dir — a blowup on a later (bigger) corpus keeps the finished
    // rows (the ×64 lesson: an end-only write lost sf0.1/×10 when
    // P=4 at 128k spilled the disk under the pre-round-12 verify).
    def writeOut(dirs: Seq[String]): String = {
      val json = s"""{"cosine_threshold":${Dedup.EmbedCosineThreshold},""" +
        s""""mid_tier":"[0.45,0.70)","dirs":${dirs.mkString("{", ",", "}")}}"""
      try Files.writeString(Paths.get(outPath), json + "\n")
      catch { case e: Throwable => System.err.println(s"[embed-ivf] write $outPath failed: $e") }
      json
    }
    var done = Seq.empty[String]
    args.foreach { d =>
      val nVecs = Tables.embeddings(spark, d).count()
      // The sizing sweep (r12 VERDICT #1): √n (super-linear candidate
      // law) vs the flat-bucket rules n/B (candidates ∝ n). Rules that
      // collapse to the same centroid count after the 16 floor (small
      // corpora) share one build and are labeled together.
      val rules = Seq(
        "sqrt_n" -> math.max(16, math.round(math.sqrt(nVecs.toDouble)).toInt),
        "n_over_512" -> math.max(16, (nVecs / 512).toInt),
        "n_over_256" -> math.max(16, (nVecs / 256).toInt))
      val ((tTot, tMid, t70, t90), truthSec) = swept(tiered(Dedup.embedTruePairs(spark, d)))
      System.err.println(s"[embed-ivf] $d n=$nVecs sizings=${rules.toMap} " +
        s"TRUE total=$tTot mid=$tMid hi70=$t70 hi90=$t90 (${f(truthSec)}s)")
      graft.functions.DotProduct.register(spark)
      val e = Tables.embeddings(spark, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
        .withColumn("nrm",
          org.apache.spark.sql.functions.sqrt(graft.functions.VectorOps.norm2(col("v0"))))
        .select(col("vec_id"),
          org.apache.spark.sql.functions.transform(col("v0"), x => x / col("nrm")).as("v"))
        .localCheckpoint()
      var sizingJsons = Seq.empty[String]
      def emitDir(): Unit = {
        done = (done.filterNot(_.startsWith(s""""$d":"""))) :+
          (s""""$d":{"vectors":$nVecs,"true_pairs":$tTot,"true_mid":$tMid,""" +
            s""""true_hi70":$t70,"true_hi90":$t90,"truth_sec":${f(truthSec)},""" +
            s""""sizings":${sizingJsons.mkString("{", ",", "}")}}""")
        writeOut(done)
      }
      rules.groupBy(_._2).toSeq.sortBy(_._1).foreach { case (numCentroids, shared) =>
        val labels = shared.map(_._1)
        // NOT swept: fresh() leaves live localCheckpoint state the
        // index handle reads through (a scope here would sweep it).
        // The build's blocks die with drop()/the JVM; each measurement
        // below runs in its own scope, whose baseline contains them.
        val tB = System.nanoTime()
        val idx = IvfIndex.fresh(spark, s"ivfrecall|$d|c$numCentroids", e,
          numCentroids, iters = 2, quantScale = 1000000.0)
        val buildSec = (System.nanoTime() - tB) / 1e9
        try {
          val rows = Seq(1, 2, 4).map { p =>
            val (cands, candSec) = swept(Ann.embedIvfCands(idx, p).count())
            val ((vTot, vMid, v70, v90), sec) =
              swept(tiered(Ann.embedPairsIvf(idx, p)))
            System.err.println(s"[embed-ivf] $d c=$numCentroids P=$p cands=$cands " +
              s"(${f(candSec)}s) pairs=$vTot recall=${recallStr(vTot, tTot)} " +
              s"recall_mid=${recallStr(vMid, tMid)} recall_hi90=${recallStr(v90, t90)} " +
              s"(${f(sec)}s)")
            s""""P$p":{"probe":$p,"candidates":$cands,"cand_sec":${f(candSec)},""" +
              s""""verified_pairs":$vTot,"recall":${recallStr(vTot, tTot)},""" +
              s""""verified_mid":$vMid,"recall_mid":${recallStr(vMid, tMid)},""" +
              s""""verified_hi70":$v70,"recall_hi70":${recallStr(v70, t70)},""" +
              s""""verified_hi90":$v90,"recall_hi90":${recallStr(v90, t90)},""" +
              s""""pipeline_sec":${f(sec)}}"""
          }.mkString("{", ",", "}")
          sizingJsons = sizingJsons ++ labels.map(label =>
            s""""$label":{"centroids":$numCentroids,""" +
              s""""build_sec":${f(buildSec)},"probes":$rows}""")
          emitDir() // rewrite after every sizing — a later blowup keeps these
        } finally idx.drop()
      }
    }
    println(writeOut(done))
    spark.stop()
  }

  private def f(v: Double) = f"$v%.3f"
}
