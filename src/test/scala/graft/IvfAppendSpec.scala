package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.IvfIndex

/** Incremental IVF maintenance: appending new vectors under FROZEN
  * centroids must leave the table exactly as if old∪new had been
  * assigned together — same nearest-centroid argmax, same tie-break —
  * and probes must see the appended buckets. (Retraining centroids is
  * deliberately a rebuild decision, not an append side effect.) */
class IvfAppendSpec extends SparkSuite {

  private def normalized(d: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
  }

  test("append under frozen centroids == assigning the union") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length * 3 / 4)
    val eA = e.filter(col("vec_id") < cut)
    val eB = e.filter(col("vec_id") >= cut)
    assert(eB.count() > 0)

    val idx = IvfIndex.of(spark, s"ivf_append_$run", eA,
      numCentroids = 4, iters = 1, quantScale = 1000000.0)
    idx.append(eB)

    // expected assignment of the FULL corpus under the frozen centroids,
    // recomputed independently (same left-to-right dot, same tie-break)
    val cents = idx.centroids.collect()
      .map(r => r.getLong(0) -> r.getSeq[Double](1).toArray).sortBy(_._1)
    def argmax(v: Array[Double]): Long = {
      var bestCid = -1L; var best = Double.NegativeInfinity
      for ((cid, cv) <- cents) {
        var s = 0.0; var i = 0
        while (i < v.length) { s += v(i) * cv(i); i += 1 }
        if (s > best) { best = s; bestCid = cid } // ties keep lower cid
      }
      bestCid
    }
    val expected = e.collect()
      .map(r => r.getLong(0) -> argmax(r.getSeq[Double](1).toArray)).toMap
    val got = idx.assigned.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size} rows")
    assert(got == expected, "assignments diverged from union-assign")

    // a probe restricted to an appended vector's bucket finds it
    val (bId, bCid) = got.find(_._1 >= cut).get
    val probed = idx.assigned.filter(col("cid") === bCid)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(probed.contains(bId))
  }

  private def assignments(idx: IvfIndex.Index) =
    idx.assigned.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("branch under the shared frozen centroids == appended full index; isolation; drop") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length * 3 / 4)
    val eA = e.filter(col("vec_id") < cut)
    val eB = e.filter(col("vec_id") >= cut)

    val base = IvfIndex.of(spark, s"ivf_br_$run", eA,
      numCentroids = 4, iters = 1, quantScale = 1000000.0)
    val baseAssign = assignments(base)
    val br = base.branch()
    try {
      // pre-append: the branch IS the base
      assert(assignments(br) == baseAssign)
      // centroids are SHARED (frozen per generation — the drift bound)
      assert(br.centroids eq base.centroids)
      // append to the branch: view == base appended in place (the
      // existing append≡union-assign pin transfers)
      br.append(eB)
      val fullAssign = {
        val idx2 = IvfIndex.of(spark, s"ivf_br_full_$run", eA,
          numCentroids = 4, iters = 1, quantScale = 1000000.0)
        idx2.append(eB); assignments(idx2)
      }
      assert(assignments(br) == fullAssign, "branch + append ≡ appended full index")
      assert(assignments(base) == baseAssign,
        "the shared base must never see the branch's appends")
      // guard sees through; corpus-sized ops refused on the overlay
      assert(intercept[IllegalArgumentException](br.append(eA.limit(1)))
        .getMessage.contains("disjointness"))
      assert(intercept[IllegalArgumentException](br.snapshot())
        .getMessage.contains("branch"))
      assert(intercept[IllegalArgumentException](br.compact())
        .getMessage.contains("branch"))
    } finally br.drop()
    assert(assignments(base) == baseAssign)
  }

  test("snapshot probes like the source and isolates appends") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length * 3 / 4)
    val base = IvfIndex.of(spark, s"ivf_snap_$run", e.filter(col("vec_id") < cut),
      numCentroids = 4, iters = 1, quantScale = 1000000.0)
    val baseAssign = assignments(base)
    val snap = base.snapshot()
    try {
      assert(assignments(snap) == baseAssign)
      snap.append(e.filter(col("vec_id") >= cut))
      assert(assignments(base) == baseAssign,
        "the source must never see the snapshot's appends")
    } finally snap.drop()
  }
}
