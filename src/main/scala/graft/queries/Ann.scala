package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.VectorOps._

/** Approximate-nearest-neighbor search over the `embeddings` table.
  *
  * Two tiers:
  *   - brute-force cosine top-k — the correctness baseline. The query
  *     set is broadcast, so the corpus is scanned exactly once with no
  *     shuffle of the big side; per-query top-k via ranking window
  *     (at real scale: per-partition heap + treeReduce, noted below);
  *   - IVF (inverted-file) — the scale path: corpus is bucketed by
  *     nearest centroid (one shuffle at build time, amortized across
  *     queries), a query probes only the closest `nprobe` centroid
  *     buckets, cutting scanned vectors by ~centroids/nprobe.
  *     Centroids here are a deterministic subset (vec_id < 16) so the
  *     whole pipeline is oracle-checkable; k-means iterations would
  *     slot in without changing the query shape.
  */
object Ann {

  private val K = 10
  private val NumQueries = 5 // query set: vec_id < 5
  private val NumCentroids = 16 // centroid set: vec_id < 16
  private val NProbe = 4

  private def vecs(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Brute-force exact top-k per query vector.
    "ann_bruteforce" -> ((s, d) => {
      val e = vecs(s, d)
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("v")).as("cosine"))
        .withColumn("rank", row_number().over(w))
        .filter(col("rank") <= K)
        .orderBy(col("query_id"), col("rank"))
    }),

    // IVF: assign corpus to nearest centroid, probe top-4 centroids
    // per query, exact top-k within the probed buckets.
    "ann_ivf" -> ((s, d) => {
      val e = vecs(s, d)
      val cent = e.filter(col("vec_id") < NumCentroids)
        .select(col("vec_id").as("cid"), col("v").as("cv"))
      val q = e.filter(col("vec_id") < NumQueries)
        .select(col("vec_id").as("query_id"), col("v").as("qv"))

      val wAssign = Window.partitionBy(col("vec_id"))
        .orderBy(col("ccos").desc, col("cid"))
      val assigned = e.crossJoin(broadcast(cent))
        .select(col("vec_id"), col("v"), col("cid"), cosine(col("v"), col("cv")).as("ccos"))
        .withColumn("rn", row_number().over(wAssign))
        .filter(col("rn") === 1)
        .select(col("vec_id"), col("v"), col("cid"))

      val wProbe = Window.partitionBy(col("query_id"))
        .orderBy(col("qcos").desc, col("cid"))
      val probes = q.crossJoin(broadcast(cent))
        .select(col("query_id"), col("qv"), col("cid"), cosine(col("qv"), col("cv")).as("qcos"))
        .withColumn("rn", row_number().over(wProbe))
        .filter(col("rn") <= NProbe)
        .select(col("query_id"), col("qv"), col("cid"))

      val wTop = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("vec_id"))
      assigned.join(broadcast(probes), Seq("cid"))
        .filter(col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id"), cosine(col("qv"), col("v")).as("cosine"))
        .withColumn("rank", row_number().over(wTop))
        .filter(col("rank") <= K)
        .orderBy(col("query_id"), col("rank"))
    })
  )

  private val cosAB = cosineSql("a.v", "b.v")
  private val cosQV = cosineSql("q.qv", "x.v")
  private val cosVC = cosineSql("e.v", "c.cv")
  private val cosQC = cosineSql("q.qv", "c.cv")

  def oracles: Map[String, String] = Map(
    "ann_bruteforce" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |scored AS (SELECT q.query_id, x.vec_id, $cosQV AS cosine
         |           FROM e x CROSS JOIN q WHERE x.vec_id <> q.query_id),
         |ranked AS (SELECT query_id, vec_id, cosine,
         |             ROW_NUMBER() OVER (PARTITION BY query_id
         |                                ORDER BY cosine DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin,
    "ann_ivf" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
         |c AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < $NumCentroids),
         |q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < $NumQueries),
         |assigned AS (
         |  SELECT vec_id, v, cid FROM (
         |    SELECT e.vec_id, e.v, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                         ORDER BY $cosVC DESC, c.cid) AS rn
         |    FROM e CROSS JOIN c) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, qv, cid FROM (
         |    SELECT q.query_id, q.qv, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |                         ORDER BY $cosQC DESC, c.cid) AS rn
         |    FROM q CROSS JOIN c) WHERE rn <= $NProbe),
         |scored AS (
         |  SELECT q.query_id, x.vec_id, $cosQV AS cosine
         |  FROM assigned x JOIN probes q USING (cid)
         |  WHERE x.vec_id <> q.query_id),
         |ranked AS (SELECT query_id, vec_id, cosine,
         |             ROW_NUMBER() OVER (PARTITION BY query_id
         |                                ORDER BY cosine DESC, vec_id) AS rank
         |           FROM scored)
         |SELECT query_id, vec_id, cosine, rank FROM ranked WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin
  )
}
