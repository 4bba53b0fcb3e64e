package graft

import org.apache.spark.sql.functions._

import graft.queries.{EmbedIndex, MinhashIndex}

/** Crash-recovery contract of the CONCURRENT two-table appends (r16):
  * MinhashIndex/EmbedIndex submit their two disjoint table writes as
  * concurrent jobs, so a failure between/among commits can strand
  * EITHER table ahead. The contract is (a) both stranded states are
  * probe-benign — the probe answers exactly what an index without the
  * stranded rows answers — and (b) a RETRY of the failed append trips
  * the disjointness guard loudly whichever table landed first (the
  * union-of-both-id-sets guard this spec exists to pin; the former
  * arrays-first serialized order only ever guarded one direction). */
class MinhashAppendRecoverySpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def corpusDocs = Tables.documents(spark, d)
    .filter(pmod(col("doc_id"), lit(10)) =!= 0).select(col("doc_id"), col("text"))
  private def deltaDocs = Tables.documents(spark, d)
    .filter(pmod(col("doc_id"), lit(10)) === 0).select(col("doc_id"), col("text"))
  private def half1 = corpusDocs.filter(col("doc_id") % 2 === 1)
  private def half2 = corpusDocs.filter(col("doc_id") % 2 === 0)

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(_.toSeq).toSeq

  test("minhash: retry after a stranded ARRAYS commit trips the guard; probe benign") {
    val idx = MinhashIndex.fresh(spark, s"rec-arr|$d", half1)
    val ref = MinhashIndex.fresh(spark, s"rec-arr-ref|$d", half1)
    try {
      val before = rows(idx.probe(deltaDocs))
      // Simulate a crash that committed ONLY the arrays table.
      idx.writeBucketed(
        idx.deriveRows(half2).filter(col("sig").isNotNull)
          .select(col("doc_id"), col("hs")),
        idx.arraysTable, "doc_id", idx.buckets, "append")
      assert(rows(idx.probe(deltaDocs)) == before,
        "arrays-ahead must be probe-benign (no bands → never a candidate)")
      val e = intercept[IllegalArgumentException] { idx.append(half2) }
      assert(e.getMessage.contains("disjointness"))
      assert(rows(ref.probe(deltaDocs)) == before)
    } finally { idx.drop(); ref.drop() }
  }

  test("minhash: retry after a stranded BANDS commit trips the guard; probe benign") {
    val idx = MinhashIndex.fresh(spark, s"rec-band|$d", half1)
    val full = MinhashIndex.fresh(spark, s"rec-band-full|$d", corpusDocs)
    try {
      val before = rows(idx.probe(deltaDocs))
      // Simulate a crash that committed ONLY the bands table: splice
      // half2's band rows (taken from a full index) into idx's bands.
      idx.writeBucketed(
        full.bands.join(half2.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        idx.tableName, "band_key", idx.buckets, "append")
      assert(rows(idx.probe(deltaDocs)) == before,
        "bands-ahead must be probe-benign (candidates with no verify-side array drop)")
      val e = intercept[IllegalArgumentException] { idx.append(half2) }
      assert(e.getMessage.contains("disjointness"))
    } finally { idx.drop(); full.drop() }
  }

  test("embed: retry after either stranded commit trips the guard") {
    val corpusVecs = Tables.embeddings(spark, d)
      .filter(pmod(col("vec_id"), lit(10)) =!= 0)
      .select(col("vec_id"), col("embedding"))
    val h1 = corpusVecs.filter(col("vec_id") % 2 === 1)
    val h2 = corpusVecs.filter(col("vec_id") % 2 === 0)
    // vectors-ahead
    val a = EmbedIndex.fresh(spark, s"rec-vec|$d", h1)
    try {
      a.writeBucketed(a.deriveRows(h2).select(col("vec_id"), col("v")),
        a.vecsTable, "vec_id", a.buckets, "append")
      assert(intercept[IllegalArgumentException] { a.append(h2) }
        .getMessage.contains("disjointness"))
    } finally a.drop()
    // bands-ahead (band rows spliced from a full index)
    val b = EmbedIndex.fresh(spark, s"rec-band|$d", h1)
    val full = EmbedIndex.fresh(spark, s"rec-band-full|$d", corpusVecs)
    try {
      b.writeBucketed(
        full.bands.join(h2.select(col("vec_id")), Seq("vec_id"), "left_semi"),
        b.tableName, "pk", b.buckets, "append")
      assert(intercept[IllegalArgumentException] { b.append(h2) }
        .getMessage.contains("disjointness"))
    } finally { b.drop(); full.drop() }
  }
}
