package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.IvfIndex

/** IVF generation rotation: `retrain()` re-runs the deterministic
  * Lloyd loop over the CURRENTLY indexed vectors and reassigns, so
  * retrain after any sequence of frozen-centroid appends must land
  * exactly on the fresh-build state for the union corpus — and
  * `fitStats` is the drift gauge that says when the rotation is worth
  * paying (mean/min assigned cosine fall as appends drift from the
  * trained distribution, and recover after retrain). */
class IvfRetrainSpec extends SparkSuite {

  private def normalized(d: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
  }

  test("retrain after frozen appends == fresh build on the union") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val base = e.filter(pmod(col("vec_id"), lit(10)) =!= 0)
    val delta = e.filter(pmod(col("vec_id"), lit(10)) === 0)
    assert(delta.count() > 0)

    var inc = IvfIndex.fresh(spark, s"ivf_rt_inc_$run", base,
      numCentroids = 4, iters = 2, quantScale = 1000000.0)
    val full = IvfIndex.fresh(spark, s"ivf_rt_full_$run", e,
      numCentroids = 4, iters = 2, quantScale = 1000000.0)
    try {
      inc = inc.append(delta)
      inc = inc.retrain(iters = 2, quantScale = 1000000.0)

      // Same centroids, bit for bit: the quantized Lloyd loop is
      // order-independent and the incremental path's vectors round-trip
      // parquet exactly, so no tolerance is needed.
      def cents(i: IvfIndex.Index): Seq[(Long, Seq[Double])] =
        i.centroids.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
          .sortBy(_._1).toSeq
      assert(cents(inc) == cents(full), "retrained centroids != fresh-build centroids")

      // Same assignment table.
      def assigned(i: IvfIndex.Index): Map[Long, Long] =
        i.assigned.select("vec_id", "cid").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
      val a = assigned(inc); val b = assigned(full)
      assert(a.size == b.size && a == b, "retrained assignment != fresh-build assignment")
    } finally { inc.drop(); full.drop() }
  }

  test("fitStats gauges drift under frozen appends and recovery after retrain") {
    import spark.implicits._
    val run = java.util.UUID.randomUUID().toString.take(8)
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    // Two tight clusters on axes 0 and 1, ALTERNATING by id so the
    // seed set (vec_id < 2) holds one vector of each cluster; then a
    // delta on the ORTHOGONAL axis 2 — the worst case for frozen
    // centroids (assigned cosine exactly 0).
    val base = (0L until 20L).map(i => (i, oneHot((i % 2).toInt)))
      .toDF("vec_id", "v")
    val delta = (100L until 110L).map(i => (i, oneHot(2))).toDF("vec_id", "v")

    var idx = IvfIndex.fresh(spark, s"ivf_rt_fit_$run", base,
      numCentroids = 2, iters = 2, quantScale = 1000000.0)
    try {
      def fit(i: IvfIndex.Index): (Long, Double, Double, Double) = {
        val r = i.fitStats.collect().head
        (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3))
      }
      val (n0, mean0, min0, frac0) = fit(idx)
      assert(n0 == 20 && mean0 > 0.999 && min0 > 0.999,
        s"perfectly clustered base must fit its centroids: $mean0/$min0")
      assert(frac0 <= 0.5 + 1e-9, s"two equal buckets: $frac0")

      idx = idx.append(delta)
      val (n1, mean1, min1, _) = fit(idx)
      assert(n1 == 30, s"append indexed the delta: $n1")
      assert(mean1 < mean0 - 0.2 && min1 < 1e-9,
        s"orthogonal delta under frozen centroids must read as drift: $mean1/$min1")

      idx = idx.retrain(iters = 2, quantScale = 1000000.0)
      val (n2, mean2, min2, _) = fit(idx)
      assert(n2 == 30)
      assert(mean2 > mean1 + 0.1 && min2 > 0.5,
        s"retrain must recover the fit: $mean2/$min2 vs frozen $mean1/$min1")
    } finally idx.drop()
  }

  test("drift cadence: append auto-retrains exactly when the gauge crosses") {
    import spark.implicits._
    import graft.queries.IndexMaintenance
    val run = java.util.UUID.randomUUID().toString.take(8)
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    val base = (0L until 20L).map(i => (i, oneHot((i % 2).toInt))).toDF("vec_id", "v")
    val goodDelta = (200L until 210L).map(i => (i, oneHot((i % 2).toInt))).toDF("vec_id", "v")
    val badDelta = (100L until 110L).map(i => (i, oneHot(2))).toDF("vec_id", "v")
    assert(IndexMaintenance.ivfFitCheckEvery == 0 &&
      IndexMaintenance.ivfRetrainBelowCos == 0.0, "cadence defaults off")
    IndexMaintenance.ivfFitCheckEvery = 1
    IndexMaintenance.ivfRetrainBelowCos = 0.9
    var auto = IvfIndex.fresh(spark, s"ivf_rt_auto_$run", base,
      numCentroids = 2, iters = 2, quantScale = 1000000.0)
    try {
      val g0 = auto
      auto = auto.append(goodDelta)
      assert(auto eq g0, "a well-fitting append (mean cosine 1.0) must not rotate")
      auto = auto.append(badDelta) // mean falls to 30/40 = 0.75 < 0.9
      assert(auto ne g0, "drift past the threshold must rotate the generation")
      assert(intercept[IllegalStateException](g0.assigned.count())
        .getMessage.contains("stale"), "the pre-rotation handle is stale")

      // The auto-rotation lands exactly on a manual retrain of the
      // same state (knobs off on the twin).
      IndexMaintenance.ivfFitCheckEvery = 0
      IndexMaintenance.ivfRetrainBelowCos = 0.0
      var manual = IvfIndex.fresh(spark, s"ivf_rt_man_$run", base,
        numCentroids = 2, iters = 2, quantScale = 1000000.0)
      try {
        manual = manual.append(goodDelta).append(badDelta).retrain()
        def assigned(i: IvfIndex.Index): Map[Long, Long] =
          i.assigned.select("vec_id", "cid").collect()
            .map(r => r.getLong(0) -> r.getLong(1)).toMap
        assert(assigned(auto) == assigned(manual),
          "auto-retrain == manual retrain on the same state")
      } finally manual.drop()
    } finally {
      IndexMaintenance.ivfFitCheckEvery = 0
      IndexMaintenance.ivfRetrainBelowCos = 0.0
      auto.drop()
    }
  }

  test("both cadences on: compaction rotations must not starve the fit counter") {
    // r11 ADVICE (medium): the fit cadence was keyed by `tableName`,
    // which rotates to _gN+1 on every auto-compaction — with
    // compact_every_appends <= ivf_fit_check_every each rotation
    // started a fresh fit counter, so the gauge silently never ran.
    // Keyed by the generation-stable baseName, the second append below
    // must fire the gauge (mean cosine 20/40 = 0.5 < 0.9) and land
    // exactly on the manual append+append+retrain twin.
    import spark.implicits._
    import graft.queries.IndexMaintenance
    val run = java.util.UUID.randomUUID().toString.take(8)
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    val base = (0L until 20L).map(i => (i, oneHot((i % 2).toInt))).toDF("vec_id", "v")
    val d1 = (100L until 110L).map(i => (i, oneHot(2))).toDF("vec_id", "v")
    val d2 = (200L until 210L).map(i => (i, oneHot(3))).toDF("vec_id", "v")
    IndexMaintenance.compactEveryAppends = 1 // every append rotates the generation
    IndexMaintenance.ivfFitCheckEvery = 2    // the gauge is due on the SECOND append
    IndexMaintenance.ivfRetrainBelowCos = 0.9
    var auto = IvfIndex.fresh(spark, s"ivf_rt_both_$run", base,
      numCentroids = 2, iters = 2, quantScale = 1000000.0)
    try {
      auto = auto.append(d1) // auto-compacts; fit counter 1 of 2
      auto = auto.append(d2) // auto-compacts; gauge fires -> retrain
      IndexMaintenance.compactEveryAppends = 0
      IndexMaintenance.ivfFitCheckEvery = 0
      IndexMaintenance.ivfRetrainBelowCos = 0.0
      var manual = IvfIndex.fresh(spark, s"ivf_rt_bothm_$run", base,
        numCentroids = 2, iters = 2, quantScale = 1000000.0)
      try {
        manual = manual.append(d1).append(d2).retrain()
        def cents(i: IvfIndex.Index): Seq[(Long, Seq[Double])] =
          i.centroids.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toSeq))
            .sortBy(_._1).toSeq
        assert(cents(auto) == cents(manual),
          "the fit gauge must survive compaction rotations: auto != manual retrain")
      } finally manual.drop()
    } finally {
      IndexMaintenance.compactEveryAppends = 0
      IndexMaintenance.ivfFitCheckEvery = 0
      IndexMaintenance.ivfRetrainBelowCos = 0.0
      auto.drop()
    }
  }

  test("retrain rotates the generation: stale handles and branches fail fast") {
    import spark.implicits._
    val run = java.util.UUID.randomUUID().toString.take(8)
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    val e = (0L until 8L).map(i => (i, oneHot((i % 4).toInt))).toDF("vec_id", "v")
    val idx0 = IvfIndex.fresh(spark, s"ivf_rt_stale_$run", e,
      numCentroids = 2, iters = 1, quantScale = 1000000.0)
    val br = idx0.branch()
    val idx1 = idx0.retrain(iters = 1, quantScale = 1000000.0)
    try {
      val ex1 = intercept[IllegalStateException](idx0.assigned.count())
      assert(ex1.getMessage.contains("stale IvfIndex handle"))
      val ex2 = intercept[IllegalStateException](br.assigned.count())
      assert(ex2.getMessage.contains("stale IvfIndex handle"))
      assert(idx1.assigned.count() == 8)
      // a branch taken AFTER the rotation rides the new generation
      val br2 = idx1.branch()
      assert(br2.assigned.count() == 8)
      br2.drop()
    } finally { br.drop(); idx1.drop() }
  }

  test("a LIVE serving branch fails fast across a base retrain and still drops cleanly") {
    // The serve-while-retrain handoff contract (r12 VERDICT #6): the
    // EvolveServe closure answers queries off zero-copy branches whose
    // view UNIONS the base table — so when retrain() rotates the base
    // generation (and drops the old generation's table), an old branch
    // cannot stay valid to drain: its probes fail fast with the
    // actionable stale-handle message (never a bare missing-table
    // error), a standing server re-branches from the handle retrain()
    // returned, and the dead branch's own delta tables still drop
    // cleanly. This pins the LIVE-branch case — delta appended and
    // probes answered before the rotation — which the stale-handle
    // test above (empty branch) did not exercise.
    import spark.implicits._
    graft.functions.DotProduct.register(spark)
    val run = java.util.UUID.randomUUID().toString.take(8)
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    val e = (0L until 8L).map(i => (i, oneHot((i % 4).toInt))).toDF("vec_id", "v")
    val idx0 = IvfIndex.fresh(spark, s"ivf_rt_live_$run", e,
      numCentroids = 2, iters = 1, quantScale = 1000000.0)
    val br = idx0.branch()
      .append((100L until 104L).map(i => (i, oneHot((i % 4).toInt))).toDF("vec_id", "v"))
    assert(br.assigned.count() == 12, "live branch answers before the rotation")
    val idx1 = idx0.retrain(iters = 1, quantScale = 1000000.0)
    try {
      val ex = intercept[IllegalStateException](br.assigned.count())
      assert(ex.getMessage.contains("stale IvfIndex handle"),
        s"draining an old branch mid-rotation must fail fast, got: ${ex.getMessage}")
      br.drop() // the dead branch's delta tables still clean up
      val br2 = idx1.branch()
      assert(br2.assigned.count() == 8, "re-branching from the returned handle serves on")
      br2.drop()
    } finally idx1.drop()
  }
}
