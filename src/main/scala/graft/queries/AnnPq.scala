package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, VectorOps}

/** Product-quantization ANN (`ann_pq`) — the rung BELOW SQ8 on the
  * quantized-serving memory ladder: where SQ8 keeps one int8 PER
  * DIMENSION (64 bytes/vector), PQ keeps one 4-bit centroid id per
  * 4-dim subspace — 16 codes, 8 packed bytes/vector, 8× smaller than
  * SQ8 and 64× smaller than the float64 vectors: the shape a 100 TB
  * vector store serves from when even int8 codes don't fit the
  * serving fleet's RAM. Geometry, training discipline, and the
  * measured subspace-sizing rationale live in [[PqCodec]]; the codes
  * are PERSISTED in the IVF vector table (`pc` column, derived once
  * at build/append/retrain — never at query time) and the codebooks
  * ride the index handle like the IVF centroids.
  *
  * Query shape: stage 1 is ADC (asymmetric distance computation) —
  * the query side stays exact-float: a 16×16 per-query lookup table
  * of subspace dots, each entry integer-quantized (floor(dot·1e6 +
  * 0.5) as BIGINT) so the 16-term score sum is EXACT integer
  * arithmetic in any order (quantizing an approximation loses
  * nothing — the rerank is exact-float anyway). The whole LUT rides
  * each query row as one dense integer ARRAY column, so the corpus is
  * scored in one pass over the stored codes with a single fused
  * projection — 16 O(1) array reads + an integer sum per (vector,
  * query); no shuffle join, no float reads (both plan-pinned by
  * AnnPqSpec) — keeping
  * `Pool` candidates per query; stage 2 reranks only those with the
  * exact float cosine via the candidate-id IN list (the sq8 idiom),
  * so float bytes move for ~Pool rows per query, never the corpus.
  *
  * The DuckDB oracle replays everything from the raw embeddings:
  * all 16 per-subspace k-means chains (deterministic — see
  * [[PqCodec]]), code assignment (stored ≡ recomputed), the
  * integer-quantized LUT, the exact integer score sum, and the
  * fold-exact rerank. Query cohort 4N ≤ vec_id < 5N (20–24) — its
  * own, disjoint from every other ANN gate's.
  */
object AnnPq {

  private val K = 10
  private val Pool = 50 // stage-1 candidates per query, the sq8 width
  private val M = PqCodec.M
  private val SubDim = PqCodec.SubDim
  private val PqK = PqCodec.K
  private val PqIters = PqCodec.Iters
  private val QuantScale = PqCodec.QuantScale
  private val QLo = 20 // ann_pq query cohort [20, 25)
  private val QHi = 25
  private val QLo2 = 25 // ann_ivf_pq query cohort [25, 30)
  private val QHi2 = 30

  private def corpusIdx(s: SparkSession, d: String): IvfIndex.Index = {
    DotProduct.register(s)
    Ann.corpusIdx(s, d)
  }

  /** Stage 1 (pre-checkpoint): the per-query integer LUT array off the
    * handle's codebooks, one fused pass over the STORED code column,
    * per-query top-Pool — exposed so AnnPqSpec can pin that the
    * scoring pass contains no shuffle join and never reads the float
    * column. Returns (candidates, queries). */
  private[graft] def pqCands(s: SparkSession, d: String,
      queryPred: Column, prune: Boolean = false,
      pool: Int = Pool): (DataFrame, DataFrame) = {
    val idx = corpusIdx(s, d)
    val books = idx.pqBooks.getOrElse(sys.error(
      "the corpus ANN index must carry PQ codebooks (Ann.corpusIdx builds pq = true)"))

    // Queries read their floats back from the index table (doubles
    // round-trip parquet exactly) and checkpoint — queries × 1 rows.
    val q = idx.assigned.filter(queryPred)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
      .localCheckpoint()

    // ADC lookup table, ONE dense array per query indexed sub·K + cid,
    // each part integer-quantized. The whole table rides the query
    // row, so the corpus pass is a SINGLE fused projection — M O(1)
    // array reads + an exact integer sum per (vector, query) — instead
    // of M broadcast hash joins (the first cut; 68 s vs SQ8's 7 s at
    // 128k vectors: 16 join-probe row materializations per pair lose
    // to one codegen'd expression; a MAP column is no better — Spark's
    // MapData lookup is a linear scan, 16×256 key comparisons per
    // pair). Positional indexing REQUIRES a dense M×K codebook —
    // guaranteed ONCE at train time (PqCodec.train fails loudly on an
    // empty Lloyd cell), so no per-query re-check is needed here.
    val lutArr = q.crossJoin(broadcast(books))
      .select(col("query_id"),
        (col("sub").cast("long") * PqK + col("cid")).as("lk"),
        floor(VectorOps.dot(
            slice(col("qv"), col("sub") * SubDim + 1, lit(SubDim)), col("cv"))
          * QuantScale + 0.5).cast("long").as("part"))
      .groupBy(col("query_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("lk"), col("part")))),
        x => x.getField("part")).as("lut"))

    // score = Σ_m lut[m·K + pc[m]] — exact integers, order-free.
    val scoreExpr = expr((0 until M)
      .map(m => s"element_at(lut, ${m * PqK} + CAST(pc[$m] AS INT) + 1)")
      .mkString(" + "))

    // The (vec_id, pc, query_id, lut) scoring base. Unpruned: one scan
    // of (vec_id, pc) — the 8-byte store — × the per-query LUT
    // broadcast. Pruned (ann_ivf_pq): the ann_ivf probe selection
    // picks NProbe centroids per query, the literal cid IN list
    // bucket-PRUNES the scan (SelectedBucketsCount — a broadcast join
    // never prunes), and the probes broadcast restricts each query's
    // scoring to its own probed buckets. Either way: never the floats.
    val base =
      if (!prune)
        idx.assigned.select(col("vec_id"), col("pc"))
          .crossJoin(broadcast(lutArr))
      else {
        val wProbe = Window.partitionBy(col("query_id"))
          .orderBy(col("qcos").desc, col("cid"))
        val probes = q.crossJoin(broadcast(idx.centroids))
          .select(col("query_id"), col("cid"),
            expr("graft_dot(qv, cv)").as("qcos"))
          .withColumn("rn", row_number().over(wProbe))
          .filter(col("rn") <= Ann.NProbe)
          .select(col("query_id"), col("cid"))
          .localCheckpoint()
        val probedCids = probes.select(col("cid").cast("long")).distinct()
          .collect().map(_.getLong(0)).sorted
        idx.assigned.filter(col("cid").isin(probedCids.toIndexedSeq: _*))
          .select(col("vec_id"), col("cid"), col("pc"))
          .join(broadcast(probes), Seq("cid"))
          .join(broadcast(lutArr), Seq("query_id"))
          .drop("cid")
      }

    val wCand = Window.partitionBy(col("query_id"))
      .orderBy(col("score").desc, col("vec_id"))
    val cands = base
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), scoreExpr.as("score"))
      .withColumn("crank", row_number().over(wCand))
      .filter(col("crank") <= pool)
      .select(col("query_id"), col("vec_id"))
    (cands, q)
  }

  /** The two-stage PQ top-K over `queryPred`'s cohort — shared by the
    * gate and [[AnnPqSpec]]'s recall check. */
  private[graft] def pqTopK(s: SparkSession, d: String,
      queryPred: Column, prune: Boolean = false,
      pool: Int = Pool): DataFrame = {
    val idx = corpusIdx(s, d)
    val (cands0, q) = pqCands(s, d, queryPred, prune, pool)
    val cands = cands0.localCheckpoint()

    // Stage 2: exact rerank — float vectors attached for the collected
    // candidate-id IN list only (≤ Pool×queries ids), never the corpus.
    val candIds = cands.select(col("vec_id")).distinct()
      .collect().map(_.getLong(0)).sorted
    val vAttach = idx.assigned
      .filter(col("vec_id").isin(candIds.toIndexedSeq: _*))
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

  /** [[pqTopK]] for the measurement mains ([[graft.Sq8PoolSweep]]
    * prices the PQ routes on the same persisted geometry as SQ8) and
    * [[ScaleOps.annPq]] — the default cohort IS the `ann_pq` gate's,
    * stated once here so a future cohort re-shuffle can't desync a
    * copy (the sq8TopKFor idiom). */
  private[graft] def pqTopKFor(s: SparkSession, d: String, pool: Int,
      prune: Boolean = false,
      queryPred: Column =
        col("vec_id") >= QLo && col("vec_id") < QHi): DataFrame =
    pqTopK(s, d, queryPred, prune, pool)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ann_pq" -> ((s, d) =>
      pqTopK(s, d, col("vec_id") >= QLo && col("vec_id") < QHi)),

    // The composed IVF+PQ production stack — the PQ twin of
    // ann_ivf_sq8: IVF bucket-prune (literal cid IN list, so the scan
    // reads only nprobe/centroids of the corpus off disk), the 4-bit
    // ADC rank within the probed buckets (stored codes, broadcast
    // LUTs), then the exact float rerank over the candidate IN list.
    // Each stage is already-gated machinery (ann_ivf's probe
    // selection; ann_pq's integer ADC and fold rerank), so the oracle
    // composes their chains verbatim. Query cohort 25≤vec_id<30 —
    // its own, like every ANN gate.
    "ann_ivf_pq" -> ((s, d) =>
      pqTopK(s, d, col("vec_id") >= QLo2 && col("vec_id") < QHi2,
        prune = true)))

  // ---------------------------------------------------------------- oracle

  /** DuckDB fold over `SubDim`-dim subspace slices at offset `o`
    * (1-based component o+i): same per-element op and left-to-right
    * order as the Spark folds. */
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

  /** The full two-stage PQ oracle over cohort [qLo, qHi); `prune`
    * composes the ann_ivf probe chain (same-seed spherical k-means +
    * top-NProbe probe selection) in front of the ADC scoring, exactly
    * as the Spark route restricts scoring to the probed buckets. */
  private def pqOracle(qLo: Int, qHi: Int, prune: Boolean): String = {
    val chains = (0 until M).map(subChain).mkString(",\n")
    val codeJoins = (1 until M)
      .map(m => s"JOIN pcode$m x$m USING (vec_id)").mkString(" ")
    val lutJoins = (0 until M)
      .map(m => s"JOIN plut$m l$m ON l$m.query_id = q.query_id AND l$m.cid = x$m.code$m")
      .mkString("\n  ")
    val scoreSum = (0 until M).map(m => s"l$m.part").mkString(" + ")
    val ivfChain = if (!prune) "" else
      s""",
         |c0 AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id < ${Ann.NumCentroids}),
         |${(1 to Ann.KMeansIters).map(t => Ann.kmeansIterCte(t)).mkString(",\n")},
         |c AS (SELECT cid, cv FROM c${Ann.KMeansIters}),
         |ivfassigned AS (
         |  SELECT vec_id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY e.vec_id
         |                         ORDER BY ${Ann.dotSql("e.v", "c.cv")} DESC, c.cid) AS rn
         |    FROM e CROSS JOIN c) WHERE rn = 1),
         |probes AS (
         |  SELECT query_id, cid FROM (
         |    SELECT q.query_id, c.cid,
         |      ROW_NUMBER() OVER (PARTITION BY q.query_id
         |                         ORDER BY ${Ann.dotSql("q.qv", "c.cv")} DESC, c.cid) AS rn
         |    FROM qids q CROSS JOIN c) WHERE rn <= ${Ann.NProbe})""".stripMargin
    val scoredFrom = if (!prune)
      s"""  FROM pcode0 x0 $codeJoins
         |  CROSS JOIN qids q""".stripMargin
    else {
      // Explicit ON joins: USING(vec_id) is ambiguous once ax is in
      // scope alongside the pcode tables.
      val codeJoinsOn = (1 until M)
        .map(m => s"JOIN pcode$m x$m ON x$m.vec_id = x0.vec_id").mkString(" ")
      s"""  FROM ivfassigned ax
         |  JOIN probes pr ON pr.cid = ax.cid
         |  JOIN qids q ON q.query_id = pr.query_id
         |  JOIN pcode0 x0 ON x0.vec_id = ax.vec_id $codeJoinsOn""".stripMargin
    }
    s"""WITH ${Ann.normCte},
       |qids AS (SELECT vec_id AS query_id, v AS qv FROM e
       |         WHERE vec_id >= $qLo AND vec_id < $qHi)$ivfChain,
       |$chains,
       |scored AS (
       |  SELECT q.query_id, x0.vec_id, $scoreSum AS score
       |$scoredFrom
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
  }

  def oracles: Map[String, String] = Map(
    "ann_pq" -> pqOracle(QLo, QHi, prune = false),
    "ann_ivf_pq" -> pqOracle(QLo2, QHi2, prune = true))
}
