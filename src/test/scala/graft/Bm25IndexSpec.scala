package graft

import org.apache.spark.sql.functions._

import graft.search.{Bm25, PostingsIndex}

/** The persisted BM25 postings index must (a) score bit-identically to
  * the build-per-query path, (b) never re-shuffle the postings side —
  * the corpus-sized table at 100 TB — when scoring. */
class Bm25IndexSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"
  private val terms = Seq("spark", "join", "fast", "table")

  test("indexed score values match the unindexed Bm25.score exactly") {
    val idx = PostingsIndex.forDocuments(spark, d)
    val post = Bm25.postings(Tables.documents(spark, d), "doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc"), round(col("score"), 9).as("score"), col("n_terms"))
        .orderBy(col("doc")).collect().toSeq
    assert(canon(idx.score(terms)) === canon(Bm25.score(post, terms)))
    assert(idx.score(terms).count() > 0)
  }

  test("scoring plan has no exchange on the postings side") {
    val idx = PostingsIndex.forDocuments(spark, d)
    val plan = idx.score(terms).queryExecution.executedPlan.toString
    // query terms + df arrive by broadcast; the only hash exchange is
    // the final per-doc aggregation over matched rows
    assert(!plan.contains("Exchange hashpartitioning(term"),
      "postings must not re-shuffle on term at scoring time")
    val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(hashExchanges == 1, s"expected only the per-doc agg exchange, got $hashExchanges:\n$plan")
  }

  test("a term-keyed join reads the bucketed postings without shuffling them") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val idx = PostingsIndex.forDocuments(spark, d)
      // a non-broadcast term-keyed workload: the non-bucketed side must
      // shuffle to the bucket layout; the postings side must not
      val workload = spark.range(0, 1000)
        .select(concat(lit("t"), col("id")).as("term"))
      val joined = idx.postings.join(workload, "term")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      val hashExchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
      assert(hashExchanges == 1,
        s"only the workload side may shuffle, got $hashExchanges exchanges:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
