package graft

import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.queries.DigestIndex

/** Contract of the persisted exact-dedup digest index (r8 VERDICT #1):
  * probing the built index answers exactly what re-deriving corpus
  * digests from text answers, appends extend the corpus without
  * rebuild, compaction changes nothing but file counts, stale handles
  * fail fast, and the bucketed corpus table is probed without
  * re-shuffling. */
class DigestIndexSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def corpusDocs = Tables.documents(spark, d)
    .filter(pmod(col("doc_id"), lit(10)) =!= 0).select(col("doc_id"), col("text"))
  private def deltaDocs = Tables.documents(spark, d)
    .filter(pmod(col("doc_id"), lit(10)) === 0).select(col("doc_id"), col("text"))

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy(col("doc_id")).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq

  /** The retired per-batch recompute: corpus digests re-derived from
    * TEXT, delta left-joined for membership. */
  private def recompute = {
    val corpusDigests = corpusDocs
      .select(TextHash.contentDigest(col("text")).as("content_hash")).distinct()
    deltaDocs.select(col("doc_id"), TextHash.contentDigest(col("text")).as("content_hash"))
      .join(corpusDigests.withColumn("in_corpus", lit(true)), Seq("content_hash"), "left")
      .select(col("doc_id"), col("content_hash"),
        coalesce(col("in_corpus"), lit(false)).as("in_corpus"))
  }

  test("index probe == recomputing corpus digests from text") {
    val idx = DigestIndex.of(spark, s"spec|$d", corpusDocs)
    val probed = rows(idx.probe(deltaDocs))
    assert(probed == rows(recompute))
    assert(probed.nonEmpty)
  }

  test("both membership outcomes on a corpus with known cross-cohort duplicates") {
    import spark.implicits._
    // corpus docs 1,2,3; delta doc 10 duplicates doc 1 (up to the
    // digest's normalization), delta doc 20 is new
    val corpus = Seq((1L, "Alpha  beta GAMMA"), (2L, "delta"), (3L, "epsilon"))
      .toDF("doc_id", "text")
    val delta = Seq((10L, "alpha beta gamma"), (20L, "zeta eta"))
      .toDF("doc_id", "text")
    val idx = DigestIndex.of(spark, s"spec-dup|$d", corpus)
    val got = rows(idx.probe(delta)).map(r => (r._1, r._3))
    assert(got == Seq((10L, true), (20L, false)))
  }

  test("append extends the corpus; probe equals a from-scratch full index") {
    val appended = DigestIndex
      .of(spark, s"spec-append|$d", corpusDocs.filter(col("doc_id") % 2 === 1))
      .append(corpusDocs.filter(col("doc_id") % 2 === 0))
    val full = DigestIndex.of(spark, s"spec-full|$d", corpusDocs)
    assert(rows(appended.probe(deltaDocs)) == rows(full.probe(deltaDocs)))
  }

  test("append rejects already-indexed doc ids") {
    val idx = DigestIndex.of(spark, s"spec-guard|$d", corpusDocs)
    val e = intercept[IllegalArgumentException] { idx.append(corpusDocs.limit(1)) }
    assert(e.getMessage.contains("disjointness"))
  }

  test("snapshot probes identically to its source and isolates appends") {
    import spark.implicits._
    val idx = DigestIndex.of(spark, s"spec-snap|$d", corpusDocs)
    val base = rows(idx.probe(deltaDocs))
    val snap = idx.snapshot()
    try {
      assert(rows(snap.probe(deltaDocs)) == base, "snapshot-probe ≡ source-probe")
      // Append a doc duplicating a delta doc's content TO THE SNAPSHOT:
      // the snapshot must now flag it in_corpus, the source must not.
      val deltaHead = deltaDocs.orderBy(col("doc_id")).limit(1).collect().head
      val twin = Seq((deltaHead.getLong(0) + 1000000L, deltaHead.getString(1)))
        .toDF("doc_id", "text")
      snap.append(twin)
      val probedSnap = rows(snap.probe(deltaDocs)).toMap2
      assert(probedSnap(deltaHead.getLong(0)), "snapshot sees its own append")
      assert(rows(idx.probe(deltaDocs)) == base,
        "the shared source index must never see the snapshot's appends")
    } finally snap.drop()
  }

  private implicit class RowsOps(rs: Seq[(Long, String, Boolean)]) {
    def toMap2: Map[Long, Boolean] = rs.map(r => r._1 -> r._3).toMap
  }

  test("branch: zero-copy overlay probes like the base, isolates appends, drops clean") {
    import spark.implicits._
    val idx = DigestIndex.of(spark, s"spec-branch|$d", corpusDocs)
    val base = rows(idx.probe(deltaDocs))
    val br = idx.branch()
    try {
      assert(rows(br.probe(deltaDocs)) == base, "empty overlay ≡ the base")
      val deltaHead = deltaDocs.orderBy(col("doc_id")).limit(1).collect().head
      val twin = Seq((deltaHead.getLong(0) + 2000000L, deltaHead.getString(1)))
        .toDF("doc_id", "text")
      br.append(twin)
      assert(rows(br.probe(deltaDocs)).toMap2(deltaHead.getLong(0)),
        "the branch sees its own append")
      assert(rows(idx.probe(deltaDocs)) == base,
        "the shared base must never see the branch's appends")
      val e = intercept[IllegalArgumentException] {
        br.append(corpusDocs.limit(1)) // base doc id — guard sees through
      }
      assert(e.getMessage.contains("disjointness"))
      assert(intercept[IllegalArgumentException](br.snapshot())
        .getMessage.contains("branch"))
      assert(intercept[IllegalArgumentException](br.compact())
        .getMessage.contains("branch"))
    } finally br.drop()
    assert(rows(idx.probe(deltaDocs)) == base)
  }

  test("compaction leaves probe results identical with fewer files") {
    val idx = DigestIndex.of(spark, s"spec-compact|$d",
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

  test("a stale handle fails fast after compaction") {
    val idx = DigestIndex.of(spark, s"spec-stale|$d", corpusDocs)
    val compacted = idx.compact()
    val e = intercept[IllegalStateException] { idx.probe(deltaDocs).collect() }
    assert(e.getMessage.contains("stale DigestIndex handle"))
    assert(rows(compacted.probe(deltaDocs)).nonEmpty, "the returned handle keeps working")
  }

  test("the membership probe broadcasts the delta side against the bucketed table") {
    val idx = DigestIndex.of(spark, s"spec|$d", corpusDocs)
    val plan = idx.probe(deltaDocs).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "the corpus digest table must be probed by broadcast, never shuffled:\n" + plan)
    assert(!plan.contains("Exchange hashpartitioning(content_hash"),
      "the bucketed corpus side must not re-shuffle:\n" + plan)
  }

  test("a bulk re-probe past the key gate equi-joins instead of broadcasting, same rows") {
    val idx = DigestIndex.of(spark, s"spec|$d", corpusDocs)
    val bulk = idx.probe(deltaDocs, broadcastMaxKeys = 0L)
    val plan = bulk.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastHashJoin"),
      "past the gate nothing may broadcast into the membership probe:\n" + plan)
    assert(plan.contains("ShuffledHashJoin"),
      "the fallback is a shuffled hash join on content_hash:\n" + plan)
    assert(rows(bulk) == rows(idx.probe(deltaDocs)),
      "both probe shapes must produce identical verdicts")
  }

  test("pipe_incr_clean's exact stage fires through the probe on a duplicated corpus") {
    // The sf0.01 oracle gate pins the full ledger; this pin makes the
    // exact stage provably execute through the INDEX path — a delta doc
    // duplicating a corpus doc must come back exact_dup.
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick brown fox of the day is here and the end", "en", "web"),
      (2L, "a wholly different corpus document of the same rough length", "en", "web"),
      (10L, "the quick brown fox of the day is here and the end", "en", "web"),
      (20L, "completely novel delta text that is of a nice and long shape", "en", "web"))
      .map { case (id, t, l, s) => (id, t, l, s, t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_dg_pipe").toString
    docs.write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "documents.parquet").toString)
    val out = SparkEntry.queries("pipe_incr_clean")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(4)).toMap
    assert(out(10L) == "exact_dup", s"delta doc 10 duplicates corpus doc 1: $out")
    assert(out.contains(20L) && out(20L) != "exact_dup", s"doc 20 is novel: $out")
  }
}
