package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, MinhashIndex}

/** Contract of the persisted MinHash index: probing the built index
  * answers exactly what the self-contained incremental query answers,
  * appends extend the corpus without rebuild, compaction changes
  * nothing but file counts, and the corpus tables join without
  * re-shuffling (the bucketing lever the index exists for). */
class MinhashIndexSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def corpusDocs = Tables.documents(spark, d)
    .filter(pmod(col("doc_id"), lit(10)) =!= 0).select(col("doc_id"), col("text"))
  private def deltaDocs = Tables.documents(spark, d)
    .filter(pmod(col("doc_id"), lit(10)) === 0).select(col("doc_id"), col("text"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      r.getBoolean(3))).toSeq

  test("index probe == the self-contained incremental query") {
    val idx = MinhashIndex.of(spark, s"spec|$d", corpusDocs)
    val fromIndex = rows(idx.probe(deltaDocs))
    val standalone = rows(SparkEntry.queries("d_incr_neardup")(spark, d))
    assert(fromIndex == standalone)
    assert(fromIndex.nonEmpty && fromIndex.exists(!_._4), "some delta doc matches")
  }

  test("append extends the corpus; probe equals a from-scratch full index") {
    val half1 = corpusDocs.filter(col("doc_id") % 2 === 1)
    val half2 = corpusDocs.filter(col("doc_id") % 2 === 0)
    val appended = MinhashIndex.of(spark, s"spec-append|$d", half1).append(half2)
    val full = MinhashIndex.of(spark, s"spec-full|$d", corpusDocs)
    assert(rows(appended.probe(deltaDocs)) == rows(full.probe(deltaDocs)))
  }

  test("append rejects already-indexed doc ids") {
    val idx = MinhashIndex.of(spark, s"spec-guard|$d", corpusDocs)
    val e = intercept[IllegalArgumentException] { idx.append(corpusDocs.limit(1)) }
    assert(e.getMessage.contains("disjointness"))
  }

  test("branch: zero-copy overlay probes like the base, isolates appends, drops clean") {
    val half1 = corpusDocs.filter(col("doc_id") % 2 === 1)
    val half2 = corpusDocs.filter(col("doc_id") % 2 === 0)
    val base = MinhashIndex.of(spark, s"spec-branch|$d", half1)
    val baseRows = rows(base.probe(deltaDocs))
    val br = base.branch()
    try {
      // pre-append: the branch IS the base (no delta table exists yet)
      assert(rows(br.probe(deltaDocs)) == baseRows)
      // append the other half TO THE BRANCH: the branch now answers
      // like a from-scratch full index; the base is untouched
      br.append(half2)
      val full = MinhashIndex.of(spark, s"spec-branch-full|$d", corpusDocs)
      assert(rows(br.probe(deltaDocs)) == rows(full.probe(deltaDocs)),
        "branch + append ≡ full index")
      assert(rows(base.probe(deltaDocs)) == baseRows,
        "the shared base must never see the branch's appends")
      // the branch's disjointness guard sees THROUGH to the base
      val e = intercept[IllegalArgumentException] { br.append(half1.limit(1)) }
      assert(e.getMessage.contains("disjointness"))
      // corpus-sized ops are refused on the overlay
      assert(intercept[IllegalArgumentException](br.snapshot())
        .getMessage.contains("branch"))
      assert(intercept[IllegalArgumentException](br.compact())
        .getMessage.contains("branch"))
    } finally br.drop()
    // drop() removed the overlay only
    assert(rows(base.probe(deltaDocs)) == baseRows)
  }

  test("compaction leaves probe results identical with fewer band files") {
    val idx = MinhashIndex.of(spark, s"spec-compact|$d",
        corpusDocs.filter(col("doc_id") % 2 === 1))
      .append(corpusDocs.filter(col("doc_id") % 2 === 0))
    def fileCount(t: String) =
      java.nio.file.Files.walk(java.nio.file.Paths.get(graft.util.Scratch.dir(t)))
        .filter(p => p.toString.endsWith(".parquet")).count()
    val before = rows(idx.probe(deltaDocs))
    val filesBefore = fileCount(idx.tableName)
    val compacted = idx.compact()
    assert(rows(compacted.probe(deltaDocs)) == before)
    assert(fileCount(compacted.tableName) <= filesBefore)
  }

  test("probe at a tiny hot-band cap still equals the self-contained query") {
    // r7 ADVICE: the combined cn+dn<=cap gate was equivalence-argued in
    // comments only — at sf0.001 every band is far below the default
    // cap, so the boundary path never executed. cap=1 binds on EVERY
    // colliding key (cn+dn >= 2), so the gate provably executes and
    // drops keys; the contract is that the capped probe still equals
    // capHotBands' union-window semantics in the standalone query.
    val idx = MinhashIndex.of(spark, s"spec|$d", corpusDocs)
    val capped = rows(idx.probe(deltaDocs, cap = 1))
    assert(capped == rows(Dedup.incrementalNearDup(spark, d, cap = 1)))
    assert(capped != rows(idx.probe(deltaDocs)),
      "cap=1 must change the verdicts, or the gate never executed")
  }

  test("a bulk re-probe past the key gate equi-joins instead of broadcasting, same rows") {
    val idx = MinhashIndex.of(spark, s"spec|$d", corpusDocs)
    val bulk = idx.probe(deltaDocs, broadcastMaxKeys = 0L)
    val plan = bulk.queryExecution.executedPlan.toString
    // The delta-sized verify joins may broadcast; the band_key
    // collision joins against the corpus tables must not.
    assert(!plan.contains("BroadcastHashJoin [band_key"),
      "past the gate the collision join may not broadcast the key set:\n" + plan)
    assert(plan.contains("ShuffledHashJoin [band_key"),
      "the fallback is a shuffled hash join on band_key:\n" + plan)
    assert(rows(bulk) == rows(idx.probe(deltaDocs)),
      "both probe shapes must produce identical verdicts")
  }

  test("a stale handle fails fast after compaction") {
    val idx = MinhashIndex.of(spark, s"spec-stale|$d", corpusDocs)
    val compacted = idx.compact()
    val e = intercept[IllegalStateException] { idx.probe(deltaDocs).collect() }
    assert(e.getMessage.contains("stale MinhashIndex handle"))
    assert(rows(compacted.probe(deltaDocs)).nonEmpty, "the returned handle keeps working")
  }

  test("the probe's band-collision joins broadcast the delta side") {
    val idx = MinhashIndex.of(spark, s"spec|$d", corpusDocs)
    val plan = idx.probe(deltaDocs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the corpus band table must be probed by broadcast, never shuffled:\n" + plan)
  }

  test("the bucketed arrays table joins on doc_id without re-shuffling") {
    val idx = MinhashIndex.of(spark, s"spec|$d", corpusDocs) // cached build
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probeSide = deltaDocs.select(col("doc_id").as("did"))
      val joined = idx.arrays.join(probeSide, col("doc_id") === col("did"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(doc_id"),
        "bucketed arrays side must not re-shuffle:\n" + plan)
      assert(joined.count() == 0 || joined.count() > 0) // executes
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
