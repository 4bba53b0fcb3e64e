package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.search.PostingsIndex

/** Text-retrieval operator classes (SURVEY.md §2.3) over the
  * `documents` corpus: relational BM25 (O2) and the min-max-normalized
  * hybrid re-rank (O4/O5) on top of it.
  */
object SearchQ {

  private val QueryTerms = Seq("spark", "join", "fast", "table")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // O2: BM25 top-20 with OR semantics over a fixed query-term set.
    // The postings index is built once per corpus (bucketed-by-term
    // table + collection stats) and reused across queries — scoring
    // pays only the probe, never the index build (PostingsIndex).
    "o2_bm25_topk" -> ((s, d) => {
      // round(9): JVM Math.log and C libm differ by 1 ulp on some
      // inputs; ranking is unaffected, the reported score is pinned to
      // 9 decimals on both engines.
      PostingsIndex.forDocuments(s, d).score(QueryTerms)
        .withColumnRenamed("doc", "doc_id")
        .select(col("doc_id"), round(col("score"), 9).as("score"), col("n_terms"))
        .orderBy(col("score").desc, col("doc_id"))
        .limit(20)
    }),

    // O4+O5: min-max normalize the BM25 candidates then blend with a
    // document-quality prior (length signal) — the reference's hybrid
    // re-rank shape (0.55 text relevance + 0.45 prior here).
    "o5_bm25_hybrid" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      // Lazily checkpointed (r16): the candidate frame has TWO
      // consumers — the min/max aggregate and the re-rank join — so an
      // uncheckpointed plan scored the postings probe twice per run.
      val cand = PostingsIndex.forDocuments(s, d).score(QueryTerms)
        .withColumnRenamed("doc", "doc_id")
        .localCheckpoint(false)
      val mm = cand.agg(min(col("score")).as("mn"), max(col("score")).as("mx"))
      cand.crossJoin(broadcast(mm))
        .join(docs.select(col("doc_id"), col("n_chars")), "doc_id")
        .select(col("doc_id"),
          (when(col("mx") === col("mn"), lit(1.0))
            .otherwise((col("score") - col("mn")) / (col("mx") - col("mn"))) * 0.55 +
            least(lit(1.0), col("n_chars").cast("double") / 400.0) * 0.45).as("raw"))
        .select(col("doc_id"), round(col("raw"), 9).as("hybrid_score"))
        .orderBy(col("hybrid_score").desc, col("doc_id"))
        .limit(20)
    })
  )

  private def termsSqlList = QueryTerms.map("'" + _ + "'").mkString(",")

  /** Shared oracle CTE chain mirroring Bm25.postings + Bm25.score. */
  private val bm25Cte =
    s"""tok AS (SELECT doc_id, len(string_split(text,' ')) AS doclen,
       |               unnest(string_split(text,' ')) AS term FROM documents),
       |post AS (SELECT doc_id, doclen, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2, 3),
       |nn AS (SELECT COUNT(DISTINCT doc_id) AS n FROM post),
       |ad AS (SELECT AVG(doclen) AS avgdl FROM (SELECT DISTINCT doc_id, doclen FROM post)),
       |dft AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM post GROUP BY term),
       |q AS (SELECT unnest([$termsSqlList]) AS term),
       |pt AS (SELECT p.doc_id, p.term,
       |         ln(1.0 + (nn.n - dft.df + 0.5) / (dft.df + 0.5))
       |           * (p.tf / (p.tf + 1.2 * (1.0 - 0.75 + 0.75 * p.doclen / ad.avgdl))) AS s
       |       FROM post p JOIN q USING (term) JOIN dft USING (term)
       |       CROSS JOIN nn CROSS JOIN ad),
       |sc AS (SELECT doc_id,
       |         list_reduce(list_prepend(0.0::DOUBLE,
       |           list_transform(list_sort(list(struct_pack(term := term, s := s))),
       |                          x -> x.s)), (a, b) -> a + b) AS score,
       |         COUNT(*) AS n_terms
       |       FROM pt GROUP BY doc_id)""".stripMargin

  def oracles: Map[String, String] = Map(
    "o2_bm25_topk" ->
      s"""WITH $bm25Cte
         |SELECT doc_id, round(score, 9) AS score, n_terms FROM sc
         |ORDER BY round(score, 9) DESC, doc_id LIMIT 20""".stripMargin,
    "o5_bm25_hybrid" ->
      s"""WITH $bm25Cte,
         |mm AS (SELECT MIN(score) AS mn, MAX(score) AS mx FROM sc)
         |SELECT sc.doc_id,
         |  round((CASE WHEN mm.mx = mm.mn THEN 1.0
         |        ELSE (sc.score - mm.mn) / (mm.mx - mm.mn) END) * 0.55
         |  + least(1.0, CAST(d.n_chars AS DOUBLE) / 400.0) * 0.45, 9) AS hybrid_score
         |FROM sc CROSS JOIN mm JOIN documents d USING (doc_id)
         |ORDER BY hybrid_score DESC, sc.doc_id LIMIT 20""".stripMargin
  )
}
