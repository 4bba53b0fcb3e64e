package graft

import org.apache.spark.sql.functions._

import graft.search.PostingsIndex

/** Incremental index maintenance: build + append must be
  * indistinguishable — bit-identical BM25 scores — from a full rebuild
  * over the union. This is the beyond-parity append path a
  * continuously-fed corpus needs (the reference, like the r4 build,
  * only full-rebuilds — reference indexer.py:326). */
class PostingsAppendSpec extends SparkSuite {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  private val batchA = Seq(
    1L -> "spark shuffles the postings once",
    2L -> "bm25 ranks spark documents",
    3L -> "the quick brown fox",
    4L -> "postings live in buckets",
    5L -> "term frequency saturates with k1")
  private val batchB = Seq(
    6L -> "spark appends new postings",
    7L -> "fresh documents arrive continuously",
    8L -> "the index never rebuilds the old corpus")

  test("append(newDocs) scores bit-identically to a full rebuild") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val base = PostingsIndex.of(docsDF(batchA), "doc_id", "text", s"append_a_$run")
    val appended = base.append(docsDF(batchB), "doc_id", "text")
    val rebuilt = PostingsIndex.of(docsDF(batchA ++ batchB), "doc_id", "text",
      s"append_ab_$run")

    assert(appended.nDocs == rebuilt.nDocs)
    assert(appended.totalDoclen == rebuilt.totalDoclen)
    assert(appended.avgdl == rebuilt.avgdl) // exact, not approx

    for (terms <- Seq(Seq("spark"), Seq("postings", "the"),
        Seq("spark", "documents", "corpus"))) {
      val got = appended.score(terms).orderBy(col("doc"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      val want = rebuilt.score(terms).orderBy(col("doc"))
        .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
      assert(got.sameElements(want),
        s"scores for $terms diverged:\n got=${got.toSeq}\nwant=${want.toSeq}")
    }
    // the appended table really carries both batches
    assert(appended.postings.select(countDistinct(col("doc"))).head().getLong(0) == 8L)
  }

  test("append cost touches only the delta (no corpus-sized recompute)") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val base = PostingsIndex.of(docsDF(batchA), "doc_id", "text", s"cost_$run")
    // the delta plan must scan the new docs, never the postings table
    val delta = graft.search.Bm25.postings(docsDF(batchB), "doc_id", "text")
    val planned = delta.queryExecution.executedPlan.toString
    assert(!planned.contains("graft_postings"),
      "delta postings must not depend on the existing table")
    val appended = base.append(docsDF(batchB), "doc_id", "text")
    assert(appended.nDocs == 8L)
  }
}
