package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Probe-vs-self-contained cost comparison for the persisted embedding
  * index — the `d_incr_indexed` precedent (3.9× cheaper at ×64) struck
  * for the embedding family:
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.EmbedIndexProbe"
  *
  * Untimed setup builds the session's [[Dedup.embedIndex]] (the 90%
  * cohort at the gate geometry). Timed: p50 of [[Rounds]] rounds of
  * (a) the INDEXED probe — delta bands computed scan-locally,
  * corpus band/vector tables scanned in place — and (b) the
  * SELF-CONTAINED twin that recomputes corpus bands per call
  * (`embedLshPairsMulti` over the full table + mixed-parity best
  * match), each fully materialized via toRdd.count with the packaged
  * orphan sweep between rounds. Prints ONE JSON line; the round
  * artifact `EMBED_INDEX_SCALING.json` collects the sf0.1 and ×64
  * strikes.
  */
object EmbedIndexProbe {

  val Rounds = 5

  /** The self-contained `d_embed_incr_indexed` twin: identical verdict
    * frame, corpus bands recomputed per call — the shape the persisted
    * index exists to retire. ONE definition shared with the spec that
    * pins the equivalence ([[Dedup.embedIncrSelfContained]]). */
  private def selfContained(s: SparkSession, d: String): DataFrame =
    Dedup.embedIncrSelfContained(s, d)

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val nVecs = Tables.embeddings(spark, sfDir).count()
    val delta = Tables.embeddings(spark, sfDir)
      .filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("embedding"))

    // Untimed: the one-per-corpus index build (BuildLog-registered).
    val t0 = System.nanoTime()
    val idx = Dedup.embedIndex(spark, sfDir)
    val buildSec = (System.nanoTime() - t0) / 1e9

    def p50(body: => Long): (Long, Double) = {
      var n = 0L
      val times = (1 to Rounds).map { _ =>
        graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
          val s = System.nanoTime()
          n = body
          (System.nanoTime() - s) / 1e9
        }
      }.sorted
      (n, times(times.length / 2))
    }

    val (nIdx, idxSec) = p50(idx.probe(delta).queryExecution.toRdd.count())
    val (nSelf, selfSec) = p50(selfContained(spark, sfDir).queryExecution.toRdd.count())
    // Untimed equivalence check on the actual VERDICTS, not row counts
    // (both frames left-join off the same delta id set, so counts are
    // equal by construction and prove nothing): the artifact only
    // ships if every (vec_id, dup_of, cosine, is_new) matches.
    def verdicts(df: DataFrame): Seq[(Long, Any, Any, Boolean)] =
      df.collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getBoolean(3))).toSeq.sortBy(_._1)
    val vIdx = verdicts(idx.probe(delta))
    val vSelf = verdicts(selfContained(spark, sfDir))
    require(vIdx == vSelf,
      s"probe and self-contained verdicts diverged (${vIdx.size}/${vSelf.size} rows; " +
        s"first diff: ${vIdx.zip(vSelf).find(p => p._1 != p._2)})")

    def f(v: Double) = f"$v%.3f"
    println(s"""{"sf":"$sfDir","vectors":$nVecs,"rows":$nIdx,""" +
      s""""build_sec":${f(buildSec)},"indexed_p50":${f(idxSec)},""" +
      s""""self_contained_p50":${f(selfSec)},"ratio":${f(selfSec / idxSec)},""" +
      s""""rounds":$Rounds}""")

    // ×64 auto-compact smoke (r11 VERDICT #8): price the standing
    // pipeline's MAINTENANCE path at scale — a caller-owned snapshot
    // takes appends under `[scale] compact_every_appends = 2`, the
    // second append triggers the in-append compaction rotation, and
    // the post-boundary probe must (a) cost what the pre-boundary
    // probe costs and (b) answer verdict-identically to a cadence-OFF
    // twin that took the same appends (probe invariance across the
    // auto-compact boundary, the AutoCompactSpec claim, here asserted
    // at corpus scale). Env-gated: the default run keeps the r11
    // artifact's exact shape.
    if (sys.env.get("SPARK_GRAFT_AUTOCOMPACT_SMOKE").contains("1")) {
      val maxId = Tables.embeddings(spark, sfDir)
        .agg(org.apache.spark.sql.functions.max(col("vec_id"))).head().getLong(0)
      def shifted(k: Int): DataFrame =
        delta.withColumn("vec_id", col("vec_id") + lit((maxId + 1) * k))
      def verdicts(df: DataFrame): Seq[(Long, Any, Any, Boolean)] =
        df.collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) null else r.getLong(1),
          if (r.isNullAt(2)) null else r.getDouble(2),
          r.getBoolean(3))).toSeq.sortBy(_._1)

      def takeAppends(cadence: Int): (EmbedIndex.Index, Seq[Double]) = {
        val snap = idx.snapshot()
        val prev = IndexMaintenance.compactEveryAppends
        IndexMaintenance.compactEveryAppends = cadence
        try {
          var h = snap
          val appendSecs = (1 to 2).map { k =>
            val t = System.nanoTime()
            h = h.append(shifted(k))
            (System.nanoTime() - t) / 1e9
          }
          (h, appendSecs)
        } finally IndexMaintenance.compactEveryAppends = prev
      }

      val tSnap = System.nanoTime()
      val warm = idx.snapshot(); warm.drop() // priced once, separately
      val snapshotSec = (System.nanoTime() - tSnap) / 1e9

      val (auto, autoAppends) = takeAppends(cadence = 2)
      val (plain, plainAppends) = takeAppends(cadence = 0)
      try {
        require(auto.tableName != plain.tableName)
        val probeDelta = shifted(3)
        val (_, beforeSec) = p50(plain.probe(probeDelta).queryExecution.toRdd.count())
        val (_, afterSec) = p50(auto.probe(probeDelta).queryExecution.toRdd.count())
        require(verdicts(auto.probe(probeDelta)) == verdicts(plain.probe(probeDelta)),
          "probe verdicts diverged across the auto-compact boundary")
        println(s"""{"autocompact_smoke":{"sf":"$sfDir","cadence":2,""" +
          s""""snapshot_sec":${f(snapshotSec)},""" +
          s""""append1_sec":${f(autoAppends.head)},""" +
          s""""append2_with_autocompact_sec":${f(autoAppends(1))},""" +
          s""""plain_append_secs":[${plainAppends.map(f).mkString(",")}],""" +
          s""""probe_p50_plain":${f(beforeSec)},"probe_p50_autocompacted":${f(afterSec)},""" +
          s""""verdicts_invariant":true,"rounds":$Rounds}}""")
      } finally { auto.drop(); plain.drop() }
    }
    spark.stop()
  }
}
