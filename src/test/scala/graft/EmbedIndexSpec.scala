package graft

import org.apache.spark.sql.functions._

import graft.queries.{Dedup, EmbedIndex}

/** Contract of the persisted embedding sign-band index: probing the
  * built index answers exactly what the self-contained multiprobe
  * pair discovery answers (restricted delta→corpus, best match),
  * appends extend the corpus without rebuild, branches isolate
  * appends, compaction changes nothing but file counts, and the
  * corpus tables are probed without re-shuffling. */
class EmbedIndexSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def corpusVecs = Tables.embeddings(spark, d)
    .filter(pmod(col("vec_id"), lit(10)) =!= 0).select(col("vec_id"), col("embedding"))
  private def deltaVecs = Tables.embeddings(spark, d)
    .filter(pmod(col("vec_id"), lit(10)) === 0).select(col("vec_id"), col("embedding"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getLong(0),
      if (r.isNullAt(1)) null else r.getLong(1),
      if (r.isNullAt(2)) null else r.getDouble(2),
      r.getBoolean(3))).toSeq

  /** The SELF-CONTAINED twin: the multiprobe pair set at the gate
    * geometry, oriented delta→corpus, best match per delta vector —
    * what the index probe must reproduce without re-paying the
    * corpus-side band computation. */
  private def standalone =
    Dedup.embedIncrSelfContained(spark, d).orderBy(col("vec_id"))

  test("index probe == the self-contained multiprobe best-match") {
    val idx = EmbedIndex.of(spark, s"spec|$d", corpusVecs)
    val fromIndex = rows(idx.probe(deltaVecs))
    assert(fromIndex == rows(standalone))
    assert(fromIndex.nonEmpty, "delta cohort probes")
  }

  test("append extends the corpus; probe equals a from-scratch full index") {
    val half1 = corpusVecs.filter(col("vec_id") % 2 === 1)
    val half2 = corpusVecs.filter(col("vec_id") % 2 === 0)
    val appended = EmbedIndex.of(spark, s"spec-append|$d", half1).append(half2)
    val full = EmbedIndex.of(spark, s"spec-full|$d", corpusVecs)
    assert(rows(appended.probe(deltaVecs)) == rows(full.probe(deltaVecs)))
  }

  test("append rejects already-indexed vec ids") {
    val idx = EmbedIndex.of(spark, s"spec-guard|$d", corpusVecs)
    val e = intercept[IllegalArgumentException] { idx.append(corpusVecs.limit(1)) }
    assert(e.getMessage.contains("disjointness"))
  }

  test("branch: zero-copy overlay probes like the base, isolates appends, drops clean") {
    val half1 = corpusVecs.filter(col("vec_id") % 2 === 1)
    val half2 = corpusVecs.filter(col("vec_id") % 2 === 0)
    val base = EmbedIndex.of(spark, s"spec-branch|$d", half1)
    val baseRows = rows(base.probe(deltaVecs))
    val br = base.branch()
    try {
      assert(rows(br.probe(deltaVecs)) == baseRows)
      br.append(half2)
      val full = EmbedIndex.of(spark, s"spec-branch-full|$d", corpusVecs)
      assert(rows(br.probe(deltaVecs)) == rows(full.probe(deltaVecs)),
        "branch + append ≡ full index")
      assert(rows(base.probe(deltaVecs)) == baseRows,
        "the shared base must never see the branch's appends")
      val e = intercept[IllegalArgumentException] { br.append(half1.limit(1)) }
      assert(e.getMessage.contains("disjointness"))
      assert(intercept[IllegalArgumentException](br.snapshot())
        .getMessage.contains("branch"))
      assert(intercept[IllegalArgumentException](br.compact())
        .getMessage.contains("branch"))
    } finally br.drop()
    assert(rows(base.probe(deltaVecs)) == baseRows)
  }

  test("snapshot probes like the source and isolates appends") {
    val half1 = corpusVecs.filter(col("vec_id") % 2 === 1)
    val half2 = corpusVecs.filter(col("vec_id") % 2 === 0)
    val base = EmbedIndex.of(spark, s"spec-snap|$d", half1)
    val baseRows = rows(base.probe(deltaVecs))
    val snap = base.snapshot()
    try {
      assert(rows(snap.probe(deltaVecs)) == baseRows)
      snap.append(half2)
      assert(rows(base.probe(deltaVecs)) == baseRows,
        "the source must never see the snapshot's appends")
    } finally snap.drop()
  }

  test("compaction leaves probe results identical with fewer band files") {
    val idx = EmbedIndex.of(spark, s"spec-compact|$d",
        corpusVecs.filter(col("vec_id") % 2 === 1))
      .append(corpusVecs.filter(col("vec_id") % 2 === 0))
    def fileCount(t: String) =
      java.nio.file.Files.walk(java.nio.file.Paths.get(graft.util.Scratch.dir(t)))
        .filter(p => p.toString.endsWith(".parquet")).count()
    val before = rows(idx.probe(deltaVecs))
    val filesBefore = fileCount(idx.tableName)
    val compacted = idx.compact()
    assert(rows(compacted.probe(deltaVecs)) == before)
    assert(fileCount(compacted.tableName) <= filesBefore)
  }

  test("a bulk re-probe past the key gate equi-joins instead of broadcasting, same rows") {
    val idx = EmbedIndex.of(spark, s"spec|$d", corpusVecs)
    val bulk = idx.probe(deltaVecs, broadcastMaxKeys = 0L)
    val plan = bulk.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin [pk"),
      "past the gate the collision join may not broadcast the key set:\n" + plan)
    assert(plan.contains("ShuffledHashJoin [pk"),
      "the fallback is a shuffled hash join on pk:\n" + plan)
    assert(rows(bulk) == rows(idx.probe(deltaVecs)),
      "both probe shapes must produce identical verdicts")
  }

  test("a stale handle fails fast after compaction") {
    val idx = EmbedIndex.of(spark, s"spec-stale|$d", corpusVecs)
    val compacted = idx.compact()
    val e = intercept[IllegalStateException] { idx.probe(deltaVecs).collect() }
    assert(e.getMessage.contains("stale EmbedIndex handle"))
    assert(rows(compacted.probe(deltaVecs)).nonEmpty, "the returned handle keeps working")
  }

  test("the probe's band-collision joins broadcast the delta side") {
    val idx = EmbedIndex.of(spark, s"spec|$d", corpusVecs)
    val plan = idx.probe(deltaVecs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the corpus band table must be probed by broadcast, never shuffled:\n" + plan)
  }

  test("the bucketed vectors table joins on vec_id without re-shuffling") {
    val idx = EmbedIndex.of(spark, s"spec|$d", corpusVecs) // cached build
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val probeSide = deltaVecs.select(col("vec_id").as("vid"))
      val joined = idx.vectors.join(probeSide, col("vec_id") === col("vid"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange hashpartitioning(vec_id"),
        "bucketed vectors side must not re-shuffle:\n" + plan)
      assert(joined.count() == 0 || joined.count() > 0) // executes
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
