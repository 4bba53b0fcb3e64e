package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Evolving-pipeline scale probe (r9 VERDICT #5/#6) — measures the two
  * halves of the standing ingest story the gate numbers don't itemize:
  *
  *   1. the K-CURVE: `incrEvolve` wall-clock at K ∈ {1, 3, 8} ordered
  *      batches over the same delta cohort — a standing pipeline runs
  *      K→∞, so per-batch cost must not grow with K (each batch is
  *      delta/K-sized; the fixed per-batch floor is the probe+append
  *      machinery). Round 11 adds the same curve WITH the embedding
  *      stage (`k_curve_embed`) — pricing the third zero-copy branch
  *      (EmbedIndex probe + accepted-vector appends) per batch;
  *   2. the WRITE half: per-batch `append` cost on both persisted
  *      indexes across repeated batches (does batch N+1's append pay
  *      more than batch 1's? it must not — appends are delta-sized
  *      bucketed writes), plus the `compact()` rewrite that folds the
  *      accumulated one-file-per-append buckets back to one file each,
  *      and the `snapshot()` clone cost the evolve gate now pays
  *      instead of a full rebuild.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.EvolveProbe"
  *
  * Prints one JSON line (also the artifact `INCR_EVOLVE_SCALING.json`
  * via shell redirection in scripts). Round protocol: p50 of
  * SPARK_GRAFT_PROBE_ROUNDS (default 3) fully-materialized rounds per
  * K, per-round orphan unpersist (the Bench discipline).
  */
object EvolveProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "3").toInt
    val ks = sys.env.getOrElse("SPARK_GRAFT_EVOLVE_KS", "1,3,8")
      .split(",").map(_.trim.toInt).toSeq
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def timeOnce[A](body: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = body; (a, (System.nanoTime() - t0) / 1e9)
    }

    // Untimed: the shared session indexes (the bench-setup shape).
    // The embed index joins the build set in round 11 — the embed
    // K-curve below branches it exactly like the text indexes.
    val (_, buildSec) = timeOnce {
      mat(Dedup.incrIndex(spark, sfDir).bands.groupBy().count())
      mat(Dedup.digestIndex(spark, sfDir).digests.groupBy().count())
      mat(Dedup.embedIndex(spark, sfDir).bands.groupBy().count())
    }
    val deltaAll = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("text"))
    val deltaDocs = deltaAll.count()

    // 1. K-curve. incrEvolve itself branches, appends, sweeps, drops.
    // Run once text-only (the standing artifact's curve) and once with
    // the embed stage composed in (round 11 — prices the third branch:
    // the EmbedIndex probe + accepted-vector appends per batch).
    def kCurve(withEmbed: Boolean): String = ks.map { k =>
      val tag = if (withEmbed) "k+embed" else "k"
      graft.util.BuildLog.drain()
      val times = (0 until rounds).map { _ =>
        // blocking sweep lands after the timed window (the packaged
        // Bench discipline — see CheckpointHygiene)
        graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
          timeOnce { mat(CorpusClean.incrEvolve(spark, sfDir, k, withEmbed)) }._2
        }
      }.sorted
      val builds = graft.util.BuildLog.drain()
      val p50 = times(times.length / 2)
      System.err.println(s"[evolve-probe] $tag=$k p50=${f(p50)} max=${f(times.last)} " +
        s"per_batch=${f(p50 / k)} builds=${builds.size}")
      s"""{"k":$k,"p50_sec":${f(p50)},"max_sec":${f(times.last)},""" +
        s""""per_batch_p50_sec":${f(p50 / k)},""" +
        s""""in_gate_builds_per_round":${builds.size / math.max(1, rounds)},""" +
        s""""in_gate_build_sec_per_round":${f(builds.map(_.seconds).sum / math.max(1, rounds))}}"""
    }.mkString("[", ",", "]")
    val kRows = kCurve(withEmbed = false)
    val kRowsEmbed = kCurve(withEmbed = true)

    // 1b. Stage budget for ONE evolve batch (delta/3-sized, the gate's
    // K=3 shape) — itemizes the per-batch floor the K-curve exposes:
    // the two index probes, the composed ledger (probes + quality +
    // verdict join, eagerly checkpointed as the gate does), and the
    // two appends, each fully materialized in isolation on fresh
    // branches. Probes run twice across lines (alone, then inside the
    // ledger) — this is a diagnostic decomposition, not a sum.
    val budgetJson = {
      val mhB = Dedup.incrIndex(spark, sfDir).branch()
      val dgB = Dedup.digestIndex(spark, sfDir).branch()
      val emB = Dedup.embedIndex(spark, sfDir).branch()
      try {
        graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
          val batch = deltaAll
            .filter(pmod(col("doc_id"), lit(30)) === 0)
            .localCheckpoint()
          val nDocs = batch.count()
          // The batch's vector slice (vec_id ≡ doc_id in the testdata
          // star) — the embed stage's input, delta/3-sized like `batch`.
          val batchVecs = Tables.embeddings(spark, sfDir)
            .filter(pmod(col("vec_id"), lit(30)) === 0)
            .select(col("vec_id"), col("embedding"))
            .localCheckpoint()
          val nVecs = batchVecs.count()
          val (_, dgSec) = timeOnce { mat(dgB.probe(batch)) }
          val (_, mhSec) = timeOnce { mat(mhB.probeRows(batch)) }
          val (_, emSec) = timeOnce { mat(emB.probeRows(batchVecs)) }
          val (ledger, ledgerSec) = timeOnce {
            CorpusClean.incrLedger(spark, batch, dgB, mhB).localCheckpoint()
          }
          val (_, ledgerEmbSec) = timeOnce {
            CorpusClean.incrLedger(spark, batch, dgB, mhB,
              Some((emB, batchVecs))).localCheckpoint()
          }
          val accepted = batch
            .join(ledger.filter(col("keep")).select(col("doc_id")), "doc_id")
            .select(col("doc_id"), col("text")).localCheckpoint()
          val nKept = accepted.count()
          val (_, mhAppSec) = timeOnce { mhB.append(accepted) }
          val (_, dgAppSec) = timeOnce { dgB.append(accepted) }
          // Accepted-vector append (the text-ledger keeper set stands
          // in for the embed ledger's — same delta-sized write shape).
          val (_, emAppSec) = timeOnce {
            emB.append(batchVecs.join(
              accepted.select(col("doc_id").as("vec_id")),
              Seq("vec_id"), "left_semi"))
          }
          System.err.println(s"[evolve-probe] budget docs=$nDocs vecs=$nVecs kept=$nKept " +
            s"dg_probe=${f(dgSec)} mh_probe=${f(mhSec)} em_probe=${f(emSec)} " +
            s"ledger=${f(ledgerSec)} ledger_embed=${f(ledgerEmbSec)} " +
            s"mh_append=${f(mhAppSec)} dg_append=${f(dgAppSec)} em_append=${f(emAppSec)}")
          s"""{"batch_docs":$nDocs,"batch_vecs":$nVecs,"accepted_docs":$nKept,""" +
            s""""digest_probe_sec":${f(dgSec)},"minhash_probe_sec":${f(mhSec)},""" +
            s""""embed_probe_sec":${f(emSec)},""" +
            s""""ledger_sec":${f(ledgerSec)},"ledger_embed_sec":${f(ledgerEmbSec)},""" +
            s""""minhash_append_sec":${f(mhAppSec)},"digest_append_sec":${f(dgAppSec)},""" +
            s""""embed_append_sec":${f(emAppSec)}}"""
        }
      } finally { mhB.drop(); dgB.drop(); emB.drop() }
    }

    // 2. Write half: snapshot cost, per-batch append cost across
    // NumAppendBatches sequential batches, then compaction.
    val nBatches = 8
    val (mh, mhSnapSec) = timeOnce { Dedup.incrIndex(spark, sfDir).snapshot() }
    val (dg, dgSnapSec) = timeOnce { Dedup.digestIndex(spark, sfDir).snapshot() }
    val appendRows =
      try {
        val rows = (0 until nBatches).map { b =>
          val batch = deltaAll
            .filter(pmod(col("doc_id"), lit(10L * nBatches)) === lit(10L * b))
            .localCheckpoint()
          val n = batch.count()
          val (_, mhSec) = timeOnce { mh.append(batch) }
          val (_, dgSec) = timeOnce { dg.append(batch) }
          Dedup.freeCheckpoint(batch)
          System.err.println(
            s"[evolve-probe] append batch=$b docs=$n mh=${f(mhSec)} dg=${f(dgSec)}")
          s"""{"batch":$b,"docs":$n,"minhash_append_sec":${f(mhSec)},""" +
            s""""digest_append_sec":${f(dgSec)}}"""
        }.mkString("[", ",", "]")
        val (mh2, mhCompactSec) = timeOnce { mh.compact() }
        val (dg2, dgCompactSec) = timeOnce { dg.compact() }
        // Probe cost pre/post compaction tells whether the cadence
        // matters for reads, not just file counts.
        val probeSlice = deltaAll.orderBy(col("doc_id")).limit(1000).localCheckpoint()
        val (_, probeSec) = timeOnce { mat(mh2.probe(probeSlice)) }
        Dedup.freeCheckpoint(probeSlice)
        mh2.drop(); dg2.drop()
        s"""{"snapshot_sec":{"minhash":${f(mhSnapSec)},"digest":${f(dgSnapSec)}},""" +
          s""""appends":$rows,""" +
          s""""compact_sec":{"minhash":${f(mhCompactSec)},"digest":${f(dgCompactSec)}},""" +
          s""""post_compact_probe_1k_sec":${f(probeSec)}}"""
      } catch { case e: Throwable => mh.drop(); dg.drop(); throw e }

    println(s"""{"metric":"incr_evolve_scaling","sf":"$sfDir","delta_docs":$deltaDocs,""" +
      s""""shared_index_build_sec":${f(buildSec)},"rounds":$rounds,""" +
      s""""k_curve":$kRows,"k_curve_embed":$kRowsEmbed,""" +
      s""""batch_stage_budget":$budgetJson,""" +
      s""""write_path":$appendRows,""" +
      s""""protocol":"p50 of $rounds fully-materialized rounds per K, per-round orphan unpersist, local[$cpus]; evolve = CorpusClean.incrEvolve (zero-copy branches of the shared indexes, appends between batches); k_curve_embed = same loop with the EmbedIndex stage composed in (third branch: embed probe + accepted-vector appends per batch); write path = 1 snapshot + $nBatches sequential appends + compact on caller-owned clones"}""")
    spark.stop()
  }

  private def f(v: Double) = f"$v%.3f"
}
