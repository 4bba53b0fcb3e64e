package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, VectorOps}

/** Product-quantization ANN (`ann_pq`) — the next rung of the
  * quantized-serving ladder after SQ8 (`Ann.sq8TopK`): where SQ8 keeps
  * one int8 PER DIMENSION (64 bytes/vector), PQ keeps one centroid id
  * PER SUBSPACE — M=16 4-bit codes here, 8 packed bytes/vector (8×
  * smaller than SQ8, 64× smaller than the float64 vector), which is
  * the memory shape a 100 TB vector store actually serves from when
  * even int8 codes don't fit the serving fleet's RAM. Reference
  * analogue: the baseline's embedding near-dup/ANN surface
  * (BASELINE.json north star); the PQ construction itself is the
  * public Jégou/Douze/Schmid 2011 scheme.
  *
  * Shape: the 64-dim L2-normalized vectors are split into M=16
  * contiguous 4-dim subspaces; each subspace trains its own K=16
  * codebook with Lloyd from fixed seeds (vec_id < 16, the IvfIndex
  * seed rule) under EUCLIDEAN assignment (subvectors are not
  * unit-norm, so spherical assignment would be wrong here), and every
  * vector stores the 16 nearest-centroid ids. A query builds a 16×16
  * lookup table of subspace dots (ADC — asymmetric distance
  * computation: the query side stays exact-float) and stage 1 scores
  * the whole corpus with 16 broadcast-hash LUT joins over the code
  * columns — no shuffle, no float reads, whole-stage-codegen all the
  * way — keeping `Pool` candidates per query; stage 2 reranks only
  * those with the exact float cosine (the sq8 candidate-id IN-list
  * idiom), so float bytes move for ~Pool rows per query, never the
  * corpus. The subspace sizing is measured, not guessed: on this
  * synthetic near-random corpus (PQ's worst case — no cluster
  * structure for codebooks to exploit) M=16/K=16 at pool 50 recalls
  * 0.84 of the exact top-10, vs 0.42–0.66 for the coarser 4×16 or
  * 8×8 splits at the same pool.
  *
  * Determinism across engines (the house k-means discipline):
  *  - mean updates integer-quantize components (floor(x·1e6 + 0.5) as
  *    BIGINT) before summing — order-independent, so Spark's partial
  *    aggregation and DuckDB's replay agree bit-for-bit;
  *  - Euclidean assignment folds (x−c)² left-to-right on both sides
  *    (`aggregate(zip_with(...))` ≡ `list_reduce(list_prepend(...))`),
  *    ties break (dist asc, cid);
  *  - the LUT entries are integer-quantized too (floor(dot·1e6 + 0.5)
  *    as BIGINT): stage 1's score is then a SUM of 4 exact integers —
  *    order-independent in any engine — and quantizing an
  *    approximation loses nothing (the rerank is exact-float anyway);
  *  - the rerank cosine is the shared left-to-right fold
  *    (`graft_dot` ≡ `Ann.dotSql`), ties (cosine desc, vec_id).
  *
  * Query cohort 4N ≤ vec_id < 5N (20–24) — its own, disjoint from
  * every other ANN gate's, so no gate shares values with another.
  */
object AnnPq {

  private val K = 10
  private val Pool = 50 // stage-1 candidates per query, the sq8 width
  private val M = 16 // subspaces
  private val SubDim = 4 // dims per subspace (16 × 4 = 64)
  private val PqK = 16 // centroids per subspace codebook (4-bit codes)
  private val PqIters = 2 // Lloyd iterations (the IvfIndex cadence)
  private val QuantScale = 1000000.0 // the shared k-means/LUT quant grid
  private val QLo = 20 // query cohort [20, 25)
  private val QHi = 25

  /** Subvector m (0-based) of a 64-dim array column. */
  private def subv(v: Column, m: Int): Column =
    slice(v, m * SubDim + 1, SubDim)

  /** Left-to-right squared-Euclidean fold — mirrored by [[l2Sql]]. */
  private def l2d(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** Normalized corpus from the persisted IVF table (the shared ANN
    * frame — see Ann.persistedVecs; doubles round-trip parquet exactly
    * so the oracle's fresh normalization replays these values). */
  private def corpus(s: SparkSession, d: String): DataFrame = {
    DotProduct.register(s)
    Ann.persistedVecsFor(s, d)
  }

  /** Deterministic per-subspace Lloyd: seeds = subvectors of
    * vec_id < PqK, Euclidean assignment (ties: dist asc, cid),
    * integer-quantized mean components, NO normalization (PQ
    * codebooks live in subvector space, not on the sphere). */
  private def trainSub(es: DataFrame): DataFrame = {
    var cent = es.filter(col("vec_id") < PqK)
      .select(col("vec_id").as("cid"), col("sv").as("cv"))
    for (_ <- 1 to PqIters) {
      cent = assignSub(es, cent)
        .select(col("cid"), posexplode(col("sv")).as(Seq("dim", "val")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(floor(col("val") * QuantScale + 0.5)).as("sq"),
          count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"),
            (col("sq").cast("double") / col("n").cast("double") / QuantScale)
              .as("comp")))),
          x => x.getField("comp")).as("cv"))
    }
    cent.localCheckpoint()
  }

  /** Nearest-centroid (Euclidean) assignment of subvectors. */
  private def assignSub(es: DataFrame, cent: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("dist").asc, col("cid"))
    es.crossJoin(broadcast(cent))
      .select(col("vec_id"), col("sv"), col("cid"),
        l2d(col("sv"), col("cv")).as("dist"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("sv"), col("cid"))
  }

  /** Stage 1 (pre-checkpoint): codebooks, codes, ADC LUT joins, and the
    * per-query top-Pool window — exposed so AnnPqSpec can pin that the
    * scoring pass contains no shuffle join (codes scan + 4 broadcast
    * LUT joins only). */
  private[graft] def pqCands(s: SparkSession, d: String,
      queryPred: Column): (DataFrame, DataFrame) = {
    val e = corpus(s, d)
    // Per-subspace codebooks + codes; the wide code row (vec_id,
    // code0..code3) is the 4-byte persisted shape a production store
    // would keep (codes persisted like IvfIndex's `c` column would
    // drop the build; the gate derives them from the persisted floats).
    val subs = (0 until M).map { m =>
      val es = e.select(col("vec_id"), subv(col("v"), m).as("sv"))
      val cent = trainSub(es)
      val codes = assignSub(es, cent)
        .select(col("vec_id"), col("cid").as(s"code$m"))
      (cent, codes)
    }
    val codesWide = subs.map(_._2).reduce(_.join(_, Seq("vec_id")))
      .localCheckpoint()

    // ADC lookup tables: queries × codebooks, integer-quantized parts.
    val q = e.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .localCheckpoint()
    val luts = (0 until M).map { m =>
      q.crossJoin(broadcast(subs(m)._1))
        .select(col("query_id"), col("cid").as(s"code$m"),
          floor(VectorOps.dot(subv(col("qv"), m), col("cv")) * QuantScale
            + 0.5).cast("long").as(s"part$m"))
    }

    // Stage 1: one pass over the 4-byte codes, 4 broadcast LUT joins,
    // exact-integer score sum — no shuffle until the per-query top-Pool
    // window (which AQE shards by query_id).
    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val cands = luts.zipWithIndex
      .foldLeft(codesWide.crossJoin(broadcast(q.select(col("query_id"))))) {
        case (acc, (lut, m)) =>
          acc.join(broadcast(lut), Seq("query_id", s"code$m"))
      }
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        (0 until M).map(m => col(s"part$m")).reduce(_ + _).as("score"))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= Pool)
      .select(col("query_id"), col("vec_id"))
    (cands, q)
  }

  /** The two-stage PQ top-K over `queryPred`'s cohort — shared by the
    * gate and [[AnnPqSpec]]'s recall check. */
  private[graft] def pqTopK(s: SparkSession, d: String,
      queryPred: Column): DataFrame = {
    val e = corpus(s, d)
    val (cands0, q) = pqCands(s, d, queryPred)
    val cands = cands0.localCheckpoint()

    // Stage 2: exact rerank — float vectors attached for the collected
    // candidate-id IN list only (≤ Pool×queries ids), never the corpus.
    val candIds = cands.select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val vAttach = e.filter(col("vec_id").isin(candIds.toIndexedSeq: _*))
      .select(col("vec_id"), col("v"))
    val wTop = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    cands
      .join(broadcast(vAttach), Seq("vec_id"))
      .join(broadcast(q), Seq("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("graft_dot(qv, v)").as("cosine"))
      .withColumn("rank", row_number().over(wTop))
      .filter(col("rank") <= K)
      .orderBy(col("query_id"), col("rank"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq" -> ((s, d) =>
      pqTopK(s, d, col("vec_id") >= QLo && col("vec_id") < QHi)))

  // ---------------------------------------------------------------- oracle

  /** DuckDB fold over 16-dim subspace slices at offset `o` (1-based
    * component o+i): same per-element op and left-to-right order as
    * the Spark folds. */
  private def l2Sql(a: String, ao: Int, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, $SubDim), i -> ($a[${ao} + i] - $b[i]) * ($a[${ao} + i] - $b[i]))), (x,y) -> x + y)"

  private def dotSubSql(a: String, ao: Int, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, list_transform(generate_series(1, $SubDim), i -> $a[${ao} + i] * $b[i])), (x,y) -> x + y)"

  /** The per-subspace chain: seed → PqIters × (assign, quantized mean)
    * → final codes + query LUT. Prefix p{m}; subvectors are indexed in
    * place off `e.v` (no slice materialization). */
  private def subChain(m: Int): String = {
    val o = m * SubDim
    val seed =
      s"""p${m}c0 AS (SELECT vec_id AS cid,
         |    list_transform(generate_series(1, $SubDim), i -> v[$o + i]) AS cv
         |  FROM e WHERE vec_id < $PqK)""".stripMargin
    val iters = (1 to PqIters).map { t =>
      s"""p${m}a$t AS (SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                         ORDER BY ${l2Sql("e.v", o, "c.cv")} ASC, c.cid) AS rn
         |    FROM e CROSS JOIN p${m}c${t - 1} c) WHERE rn = 1),
         |p${m}s$t AS (SELECT a.cid, i AS dim,
         |          SUM(CAST(floor(e.v[$o + i] * ${QuantScale.toLong}.0 + 0.5) AS BIGINT)) AS sq,
         |          COUNT(*) AS n
         |        FROM p${m}a$t a JOIN e USING (vec_id)
         |        CROSS JOIN generate_series(1, $SubDim) t(i) GROUP BY a.cid, i),
         |p${m}c$t AS (SELECT cid,
         |          list(CAST(sq AS DOUBLE) / CAST(n AS DOUBLE) / ${QuantScale.toLong}.0 ORDER BY dim) AS cv
         |        FROM p${m}s$t GROUP BY cid)""".stripMargin
    }.mkString(",\n")
    val finals =
      s"""pcode$m AS (SELECT vec_id, cid AS code$m FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                         ORDER BY ${l2Sql("e.v", o, "c.cv")} ASC, c.cid) AS rn
         |    FROM e CROSS JOIN p${m}c$PqIters c) WHERE rn = 1),
         |plut$m AS (SELECT q.query_id, c.cid,
         |    CAST(floor(${dotSubSql("q.qv", o, "c.cv")} * ${QuantScale.toLong}.0 + 0.5) AS BIGINT) AS part
         |  FROM qids q CROSS JOIN p${m}c$PqIters c)""".stripMargin
    Seq(seed, iters, finals).mkString(",\n")
  }

  def oracles: Map[String, String] = Map(
    "ann_pq" -> {
      val chains = (0 until M).map(subChain).mkString(",\n")
      val codeJoins = (1 until M)
        .map(m => s"JOIN pcode$m x$m USING (vec_id)").mkString(" ")
      val lutJoins = (0 until M)
        .map(m => s"JOIN plut$m l$m ON l$m.query_id = q.query_id AND l$m.cid = x$m.code$m")
        .mkString("\n  ")
      val scoreSum = (0 until M).map(m => s"l$m.part").mkString(" + ")
      s"""WITH e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
         |e AS (SELECT vec_id,
         |        list_transform(v0, x -> x / sqrt(
         |          list_reduce(list_prepend(0.0::DOUBLE,
         |            list_transform(generate_series(1, 64), i -> v0[i] * v0[i])),
         |            (p,q) -> p + q))) AS v
         |      FROM e0),
         |qids AS (SELECT vec_id AS query_id, v AS qv FROM e
         |         WHERE vec_id >= $QLo AND vec_id < $QHi),
         |$chains,
         |scored AS (
         |  SELECT q.query_id, x0.vec_id, $scoreSum AS score
         |  FROM pcode0 x0 $codeJoins
         |  CROSS JOIN qids q
         |  $lutJoins
         |  WHERE x0.vec_id <> q.query_id),
         |pool AS (SELECT query_id, vec_id FROM (
         |    SELECT query_id, vec_id,
         |      ROW_NUMBER() OVER (PARTITION BY query_id
         |                         ORDER BY score DESC, vec_id) AS crank
         |    FROM scored) WHERE crank <= $Pool),
         |reranked AS (
         |  SELECT query_id, vec_id, cosine,
         |    ROW_NUMBER() OVER (PARTITION BY query_id
         |                       ORDER BY cosine DESC, vec_id) AS rank
         |  FROM (SELECT p.query_id, p.vec_id,
         |          ${Ann.dotSql("q.qv", "x.v")} AS cosine
         |        FROM pool p JOIN e x ON x.vec_id = p.vec_id
         |        JOIN qids q ON q.query_id = p.query_id))
         |SELECT query_id, vec_id, cosine, rank FROM reranked WHERE rank <= $K
         |ORDER BY query_id, rank""".stripMargin
    })
}
