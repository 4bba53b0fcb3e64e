package graft

import org.apache.spark.sql.functions._

import graft.queries.{DigestIndex, EmbedIndex, IndexMaintenance, MinhashIndex}

/** Contract of the probe-side bucket pruning (`[scale]
  * probe_bucket_prune_keys` → `PersistedIndex.pruneScanToKeys`): with
  * the knob on and a small delta, the corpus table scan carries
  * `SelectedBucketsCount < total` (the `ann_ivf` cid-list idiom
  * applied to the probes — SURVEY §9.10's open row); probe results
  * are identical to the knob-off full-scan shape; over-cap deltas
  * fall back to the unfiltered scan. */
class ProbeBucketPruneSpec extends SparkSuite {

  import spark.implicits._

  private def docs(ids: Long*) =
    ids.map(i => (i, s"document $i with words alpha beta gamma delta run$i")).toDF("doc_id", "text")

  private def withKnob[T](cap: Int)(body: => T): T = {
    val before = IndexMaintenance.probeBucketPruneKeys
    IndexMaintenance.probeBucketPruneKeys = cap
    try body finally IndexMaintenance.probeBucketPruneKeys = before
  }

  private def digestRows(idx: DigestIndex.Index, delta: org.apache.spark.sql.DataFrame) =
    idx.probe(delta).orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq

  test("digest probe bucket-prunes the corpus scan and stays probe-equal") {
    val idx = DigestIndex.fresh(spark, "prune-dg", docs(1L to 40L: _*))
    try {
      val delta = docs(100L, 101L)
      val full = digestRows(idx, delta)
      withKnob(64) {
        val pruned = digestRows(idx, delta)
        assert(pruned == full)
        val plan = idx.probe(delta).queryExecution.executedPlan.toString
        val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r
        val hit = m.findFirstMatchIn(plan)
        assert(hit.isDefined, s"expected a bucket-pruned scan in:\n$plan")
        assert(hit.get.group(1).toInt < hit.get.group(2).toInt)
      }
    } finally idx.drop()
  }

  test("over-cap delta falls back to the unpruned scan") {
    val idx = DigestIndex.fresh(spark, "prune-dg-cap", docs(1L to 10L: _*))
    try {
      val delta = docs(100L, 101L, 102L) // 3 distinct digests > cap 2
      withKnob(2) {
        val plan = idx.probe(delta).queryExecution.executedPlan.toString
        // an unpruned bucketed scan still prints the counter — it must
        // read "N out of N", never a strict subset
        val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r
        m.findAllMatchIn(plan).foreach(h =>
          assert(h.group(1) == h.group(2), s"cap-exceeded probe must not prune:\n$plan"))
        assert(digestRows(idx, delta) == withKnob(0)(digestRows(idx, delta)))
      }
    } finally idx.drop()
  }

  test("minhash and embed probes stay probe-equal with pruning on") {
    val mh = MinhashIndex.fresh(spark, "prune-mh", docs(1L to 20L: _*))
    val vecs = (1L to 20L)
      .map(i => (i, Array.tabulate(8)(j => ((i * 7 + j) % 5 + 1).toFloat)))
      .toDF("vec_id", "embedding")
    val em = EmbedIndex.fresh(spark, "prune-em", vecs)
    try {
      val delta = docs(1L, 200L) // doc 1's text duplicates a corpus doc
      val deltaVecs = Seq(
        (100L, Array.tabulate(8)(j => ((100L * 7 + j) % 5 + 1).toFloat)),
        (1000L, Array.tabulate(8)(_.toFloat + 1))).toDF("vec_id", "embedding")
      def mhRows = mh.probe(delta).orderBy(col("doc_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          r.getBoolean(3))).toSeq
      def emRows = em.probe(deltaVecs).orderBy(col("vec_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1),
          r.getBoolean(3))).toSeq
      val (mhFull, emFull) = (mhRows, emRows)
      withKnob(4096) {
        assert(mhRows == mhFull)
        assert(emRows == emFull)
        assert(mhFull.exists(!_._3), "expected at least one duplicate verdict")
      }
    } finally { mh.drop(); em.drop() }
  }

  test("band-scan pruning reaches the parquet scan as a pushed IN filter") {
    // The minhash/embed probes materialize their band scan behind a
    // lazy checkpoint, where the planner may disable BUCKET-level
    // elision (DisableUnnecessaryBucketedScan fires when no agg in
    // the same job exploits the bucketing) — but the IN list still
    // pushes into the parquet scan, and band tables are SORTED by
    // their key, so row-group stats skip the files' non-matching
    // ranges either way. Pin the pushdown on the pruned frame itself.
    val mh = MinhashIndex.fresh(spark, "prune-mh-push", docs(1L to 20L: _*))
    try {
      import spark.implicits._
      val keys = Seq(1L, 2L).toDF("band_key")
      withKnob(8) {
        val pruned = mh.pruneScanToKeys(mh.bands, "band_key", keys)
        val plan = pruned.join(broadcast(keys), "band_key")
          .queryExecution.executedPlan.toString
        assert(plan.contains("PushedFilters: [In(band_key"),
          s"IN list must push into the band scan:\n$plan")
      }
    } finally mh.drop()
  }

  test("[scale] index_buckets sizes a new build; the handle carries it through append+probe") {
    val beforeB = IndexMaintenance.indexBuckets
    IndexMaintenance.indexBuckets = 128
    val idx = try DigestIndex.fresh(spark, "prune-dg-128", docs(1L to 30L: _*))
    finally IndexMaintenance.indexBuckets = beforeB
    try {
      // knob restored BEFORE use: the 128 rides the handle, not the global
      val appended = idx.append(docs(500L, 501L))
      val delta = docs(1L, 900L)
      val full = digestRows(appended, delta)
      assert(full.exists(_._3), "doc 1's digest is indexed")
      withKnob(64) {
        assert(digestRows(appended, delta) == full)
        val plan = appended.probe(delta).queryExecution.executedPlan.toString
        val m = """SelectedBucketsCount: (\d+) out of (\d+)""".r
        val hit = m.findFirstMatchIn(plan)
        assert(hit.isDefined && hit.get.group(2).toInt == 128,
          s"build under index_buckets=128 must lay out 128 buckets:\n$plan")
        assert(hit.get.group(1).toInt <= 2, "2 delta digests prune to <=2 buckets")
      }
    } finally idx.drop()
  }

  test("null keys never displace real keys from the prune sample (wrong-results guard)") {
    // A null key equi-matches nothing, but if it consumed a slot of
    // the limit(cap+1) sample the over-cap check could pass on an
    // INCOMPLETE key set and the pruned scan would drop corpus rows
    // for the uncollected keys. Pin both sides of the fix: with more
    // real keys than the cap (+ a null), pruning must NOT engage; at
    // exactly the cap (+ a null), it must engage with EVERY real key
    // in the IN list.
    val idx = DigestIndex.fresh(spark, "prune-dg-null", docs(1L to 10L: _*))
    try {
      import org.apache.spark.sql.Row
      import org.apache.spark.sql.types._
      val schema = StructType(Seq(StructField("content_hash", StringType, nullable = true)))
      def keysDf(reals: Int) = spark.createDataFrame(
        spark.sparkContext.parallelize(
          (Row(null) +: (1 to reals).map(i => Row(s"k$i"))).toSeq, 1), schema)
      withKnob(3) {
        val overCap = idx.pruneScanToKeys(idx.digests, "content_hash", keysDf(4))
        assert(overCap.queryExecution.analyzed.sameResult(
          idx.digests.queryExecution.analyzed),
          "4 real keys > cap 3 must keep the unfiltered scan even with a null present")
        val atCap = idx.pruneScanToKeys(idx.digests, "content_hash", keysDf(3))
        val inList = atCap.queryExecution.analyzed.toString
        (1 to 3).foreach(i => assert(inList.contains(s"k$i"),
          s"k$i must be in the IN list:\n$inList"))
      }
    } finally idx.drop()
  }

  test("the [scale] knob reaches the flag") {
    val before = IndexMaintenance.probeBucketPruneKeys
    try {
      IndexMaintenance.configure(graft.config.EngineConfig(
        scale = graft.config.ScaleConfig(probeBucketPruneKeys = 512)))
      assert(IndexMaintenance.probeBucketPruneKeys == 512)
    } finally IndexMaintenance.probeBucketPruneKeys = before
  }
}
