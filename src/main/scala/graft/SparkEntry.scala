package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every entry in [[queries]] is one operator from SURVEY.md §2 expressed
  * over the driver's parquet star schema; [[oracleSql]] carries the DuckDB
  * equivalent for the correctness gate. Conventions for oracle parity:
  *   - every aggregate over doubles goes through DECIMAL(18,2) so Spark and
  *     DuckDB produce bit-identical values (double summation order is
  *     nondeterministic under parallelism; decimal summation is exact);
  *     final cast back to DOUBLE so schemas agree.
  *   - every result is fully ordered (ORDER BY on enough columns to pin
  *     ties) in BOTH the Spark plan and the SQL.
  *   - column names are aliased identically on both sides.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q1_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** Sum a double column exactly: decimal in, double out. */
  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast("decimal(18,2)")).cast("double")

  /** Force every one-per-corpus persisted index build (postings, IVF,
    * MinHash) for `sfDir` — the bench's EXPLICIT untimed setup step.
    * Before round 8 these builds ran only as a cache side-effect of the
    * first query that touched each index (normally its untimed warmup),
    * which left the committed bench artifact unable to say whether a
    * measured round had paid a build (the r7 `o2_bm25_topk` 1.75 s vs
    * 0.22 s anomaly). Builds register in [[graft.util.BuildLog]]. */
  def benchSetup(spark: SparkSession, sfDir: String,
      names: Set[String] = queries.keySet): Unit = {
    if (names("o2_bm25_topk") || names("o5_bm25_hybrid"))
      graft.search.PostingsIndex.forDocuments(spark, sfDir)
    if (names("ann_ivf") || names("ann_bruteforce") || names("ann_lsh") ||
        names("ann_ivf_fitstats") || names("ann_sq8") || names("ann_ivf_sq8") ||
        names("d_embed_neardup_ivf") || names("ann_pq") || names("ann_ivf_pq") ||
        names("ann_ivf_pqr") || names("ann_pq_w8") || names("ann_ivf_pq_w8") ||
        names("ann_pq_opq"))
      graft.queries.Ann.prebuildIndex(spark, sfDir)
    if (names("d_incr_indexed") || names("pipe_incr_clean") || names("st_incr_neardup") ||
        names("pipe_incr_evolve") || // evolve branches the shared indexes (r9 VERDICT #4)
        names("pipe_incr_clean_embed") || names("pipe_incr_evolve_embed"))
      graft.queries.Dedup.incrIndex(spark, sfDir)
    if (names("pipe_incr_clean") || names("pipe_incr_evolve") ||
        names("pipe_incr_clean_embed") || names("pipe_incr_evolve_embed"))
      graft.queries.Dedup.digestIndex(spark, sfDir)
    if (names("d_embed_incr_indexed") || names("pipe_incr_clean_embed") ||
        names("pipe_incr_evolve_embed"))
      graft.queries.Dedup.embedIndex(spark, sfDir)
    if (names("pipe_incr_evolve_serve") || names("pipe_incr_clean_serve")) {
      graft.queries.EvolveServe.servePostings(spark, sfDir)
      graft.queries.EvolveServe.serveIvf(spark, sfDir)
    }
    if (names("pipe_incr_clean_serve")) {
      // The composed closure also branches all three cleaning indexes.
      graft.queries.Dedup.incrIndex(spark, sfDir)
      graft.queries.Dedup.digestIndex(spark, sfDir)
      graft.queries.Dedup.embedIndex(spark, sfDir)
    }
    ()
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val base: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ----- A1/A2-class grouped aggregation (TPC-H Q1 shape) ------------
    // Reference analogue: patterns.py:133-159 (grouped counts/rollups).
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .filter(col("l_shipdate") <= lit(java.sql.Timestamp.valueOf("1998-09-01 00:00:00")))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast("decimal(18,2)") *
              (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
            .cast("double").as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    }))
    base ++ graft.queries.Relational.queries ++ graft.queries.Graph.queries ++
      graft.queries.TextAnalysis.queries ++ graft.queries.Dedup.queries ++
      graft.queries.Ann.queries ++ graft.queries.AnnPq.queries ++
      graft.queries.SearchQ.queries ++
      graft.queries.StreamQ.queries ++ graft.queries.Relational2.queries ++ graft.queries.TpchQ.queries ++ graft.queries.TpchQ2.queries ++ graft.queries.TrainPrep.queries ++ graft.queries.CorpusClean.queries ++ graft.queries.EvolveServe.queries
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  ) ++ graft.queries.Relational.oracles ++ graft.queries.Graph.oracles ++
    graft.queries.TextAnalysis.oracles ++ graft.queries.Dedup.oracles ++
    graft.queries.Ann.oracles ++ graft.queries.AnnPq.oracles ++
    graft.queries.SearchQ.oracles ++
    graft.queries.StreamQ.oracles ++ graft.queries.Relational2.oracles ++ graft.queries.TpchQ.oracles ++ graft.queries.TpchQ2.oracles ++ graft.queries.TrainPrep.oracles ++ graft.queries.CorpusClean.oracles ++ graft.queries.EvolveServe.oracles
}
