package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Price probe-side bucket pruning at a PRODUCTION bucket count
  * (round-15 deltas #10/#11): the `[scale] probe_bucket_prune_keys`
  * IN-list only pays when the table has enough buckets that a small
  * delta's keys miss most of them — nil at the gates' 32, so this
  * main builds Digest and Minhash indexes over the ×64 corpus at
  * `[scale] index_buckets` = 2048 and times a small-batch probe with
  * pruning off vs on.
  *
  *   SPARK_GRAFT_SF_DIR=target/scale_x64 \
  *     sbt "runMain graft.queries.ProbePruneCost"
  *
  * Prints one JSON line (`BENCH_probe_prune.json` via redirection).
  * Protocol: p50 of SPARK_GRAFT_PROBE_ROUNDS (default 5) fully
  * materialized probes per mode, fresh-built 2048-bucket indexes
  * (untimed), per-round orphan unpersist. Local caveat recorded in
  * the artifact: at local[32] over a warm page cache the win is
  * file-open/scan-task elision only — on object storage each skipped
  * bucket is a skipped GET, so the production win is strictly larger.
  */
object ProbePruneCost {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "target/scale_x64")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "5").toInt
    val buckets = sys.env.getOrElse("SPARK_GRAFT_PRUNE_BUCKETS", "2048").toInt
    val batchDocs = sys.env.getOrElse("SPARK_GRAFT_PRUNE_BATCH", "100").toInt
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()

    val corpus = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), col("text"))
    val delta = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .orderBy(col("doc_id")).limit(batchDocs)
      .select(col("doc_id"), col("text")).localCheckpoint()
    // The minhash probe derives 16 band keys per doc, and the
    // win-condition heuristic prunes only while keys <= buckets/4 —
    // so its demonstration batch is sized to stay under it
    // (buckets/64 docs -> buckets/4 keys).
    val mhBatchDocs = math.max(1, buckets / 64)
    val mhDelta = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .orderBy(col("doc_id")).limit(mhBatchDocs)
      .select(col("doc_id"), col("text")).localCheckpoint()
    val nCorpus = corpus.count()

    val before = IndexMaintenance.indexBuckets
    IndexMaintenance.indexBuckets = buckets
    val (dg, mh) = try {
      (DigestIndex.fresh(spark, s"prunecost|$sfDir", corpus),
        MinhashIndex.fresh(spark, s"prunecost|$sfDir", corpus))
    } finally IndexMaintenance.indexBuckets = before

    try {
      // INTERLEAVED off/on rounds (a sequential off-block-then-on-block
      // protocol bakes box drift into the comparison — the first
      // strike of this main measured the same binary 2x apart across
      // runs): each round times one off probe and one on probe
      // back-to-back in alternating order, p50 per mode.
      def probePair(mk: () => DataFrame, flip: Boolean): (Double, Double) = {
        def one(prune: Boolean): Double = {
          IndexMaintenance.probeBucketPruneKeys = if (prune) 1000000 else 0
          graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
            val t0 = System.nanoTime(); mat(mk()); (System.nanoTime() - t0) / 1e9
          }
        }
        if (flip) { val on = one(true); val off = one(false); (off, on) }
        else { val off = one(false); val on = one(true); (off, on) }
      }
      def modes(mk: () => DataFrame): (Double, Double) = {
        val pairs = (0 until rounds).map(r => probePair(mk, r % 2 == 1))
        IndexMaintenance.probeBucketPruneKeys = 0
        val offs = pairs.map(_._1).sorted; val ons = pairs.map(_._2).sorted
        (offs(offs.length / 2), ons(ons.length / 2))
      }
      val (dgOff, dgOn) = modes(() => dg.probe(delta))
      val (mhOff, mhOn) = modes(() => mh.probe(mhDelta))
      // Selected-bucket counts straight from the pruned plans — ALL
      // bucketed scans in the OUTPUT plan. Caveat recorded per index:
      // the digest probe's corpus scan sits in the output plan (the
      // ["97 of 2048"]-style entry IS the pruned scan); the minhash
      // probe materializes its band scan behind a localCheckpoint, so
      // the output plan shows only the verify-side arrays scan —
      // ProbeBucketPruneSpec pins the band-scan pruning at spec level
      // instead.
      IndexMaintenance.probeBucketPruneKeys = 1000000
      val pat = """SelectedBucketsCount: (\d+) out of (\d+)""".r
      def selected(df: DataFrame): String =
        pat.findAllMatchIn(df.queryExecution.executedPlan.toString)
          .map(m => s""""${m.group(1)} of ${m.group(2)}"""").mkString("[", ",", "]")
      val dgSel = selected(dg.probe(delta))
      val mhSel = selected(mh.probe(mhDelta))
      IndexMaintenance.probeBucketPruneKeys = 0

      def f(v: Double) = f"$v%.3f"
      println(s"""{"metric":"probe_bucket_prune","sf":"$sfDir",""" +
        s""""corpus_docs":$nCorpus,"batch_docs":$batchDocs,""" +
        s""""minhash_batch_docs":$mhBatchDocs,"index_buckets":$buckets,""" +
        s""""rounds":$rounds,""" +
        s""""digest_probe_p50_off":${f(dgOff)},"digest_probe_p50_on":${f(dgOn)},""" +
        s""""digest_selected_buckets":$dgSel,""" +
        s""""minhash_probe_p50_off":${f(mhOff)},"minhash_probe_p50_on":${f(mhOn)},""" +
        s""""minhash_selected_buckets":$mhSel,""" +
        s""""protocol":"interleaved off/on rounds (alternating order), p50 per mode",""" +
        s""""note":"local[$cpus] warm page cache - the win here is scan-task/file-open elision; on object storage each skipped bucket is a skipped GET, so the production win is strictly larger"}""")
    } finally { dg.drop(); mh.drop() }
    spark.stop()
  }
}
