package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Relational BM25 over a document corpus — the Spark re-expression of
  * the reference's SQLite FTS5 `bm25()` retrieval
  * (`/root/reference/src/ariadne_dbt/search.py:106-126`,
  * `/root/reference/src/ariadne_dbt/schema.sql:201-210`).
  *
  * Instead of a serial inverted-index structure, the index IS a
  * DataFrame of posting lists `(term, doc, tf)` built with
  * explode(tokens) — which distributes trivially: build is one shuffle
  * (groupBy term,doc), and scoring a query is a broadcast semi-join of
  * the tiny query-term set against the postings, then a per-doc
  * aggregation. At 100 TB the postings DataFrame would be bucketed by
  * term so repeated queries skip the shuffle entirely.
  *
  * Scoring uses the Lucene/Okapi form with k1=1.2, b=0.75:
  *   idf(t)  = ln(1 + (N - df + 0.5)/(df + 0.5))
  *   s(d,t)  = idf(t) · tf/(tf + k1·(1 - b + b·len(d)/avgdl))
  *   score(d) = Σ_t s(d,t)   (summed in term order — a deterministic
  *              fold, so scores are reproducible run-to-run and across
  *              engines; a plain groupBy().sum() would leave the fp
  *              summation order to shuffle arrival.)
  *
  * Exact score parity with FTS5's internal column-length accounting is
  * neither attainable nor needed (SURVEY.md §7.5); ranking-property
  * parity is what the reference's own tests assert.
  */
object Bm25 {

  val K1 = 1.2
  val B = 0.75

  /** Posting lists: one row per (doc, term) with term frequency, plus
    * per-doc token length. `docs` needs (idCol, textCol). */
  def postings(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = split(col(textCol), " ")
    docs.select(col(idCol).as("doc"), size(toks).as("doclen"), explode(toks).as("term"))
      .groupBy("doc", "doclen", "term")
      .agg(count(lit(1)).as("tf"))
  }

  /** BM25 scores for an OR-semantics term set; returns (doc, score)
    * for every doc matching ≥1 term. */
  def score(post: DataFrame, queryTerms: Seq[String]): DataFrame = {
    val spark = post.sparkSession
    import spark.implicits._
    val n = post.select(countDistinct(col("doc")).as("n"))
    val avgdl = post.select(col("doc"), col("doclen")).distinct()
      .select(avg(col("doclen")).as("avgdl"))
    val df = post.groupBy("term").agg(countDistinct(col("doc")).as("df"))
    val q = queryTerms.distinct.toDF("term")

    val perTerm = post
      .join(broadcast(q), "term")
      .join(broadcast(df), "term")
      .crossJoin(broadcast(n)).crossJoin(broadcast(avgdl))
      .select(col("doc"), col("term"),
        (log(lit(1.0) + (col("n") - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") / (col("tf") +
            lit(K1) * (lit(1.0) - B + lit(B) * col("doclen") / col("avgdl"))))).as("s"))

    perTerm.groupBy("doc")
      .agg(aggregate(
        sort_array(collect_list(struct(col("term"), col("s")))),
        lit(0.0), (acc, x) => acc + x.getField("s")).as("score"),
        count(lit(1)).as("n_terms"))
  }
}
