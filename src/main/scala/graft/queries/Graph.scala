package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.graph.Bfs

/** Graph operator classes from SURVEY.md §2.4 exercised on a DAG derived
  * from the star schema: region → nation → {customer, supplier}, with
  * typed string ids ("region.0", "nation.3", "customer.151") mirroring
  * dbt's "model.project.name" unique_id shape.
  *
  * DuckDB oracles express the same traversals as bounded recursive CTEs.
  */
object Graph {

  private def id(prefix: String, c: org.apache.spark.sql.Column) =
    concat(lit(prefix + "."), c.cast("string"))

  /** The derived edge list (parent_id, child_id), materialized once via
    * localCheckpoint for BFS consumers: the hop loop joins edges every
    * iteration, and without the checkpoint each hop re-unions three
    * parquet scans (VERDICT r2 what's-wrong #4 — visible as g8's 5 s).
    * On a cluster this is the "cache the edge RDD before iterating"
    * rule every iterative-graph job follows. */
  def checkpointedEdges(s: SparkSession, d: String): DataFrame =
    edges(s, d).localCheckpoint()

  /** The derived edge list (parent_id, child_id). */
  def edges(s: SparkSession, d: String): DataFrame = {
    val rn = Tables.nation(s, d).select(
      id("region", col("n_regionkey")).as("parent_id"),
      id("nation", col("n_nationkey")).as("child_id"))
    val nc = Tables.customer(s, d).select(
      id("nation", col("c_nationkey")).as("parent_id"),
      id("customer", col("c_custkey")).as("child_id"))
    val ns = Tables.supplier(s, d).select(
      id("nation", col("s_nationkey")).as("parent_id"),
      id("supplier", col("s_suppkey")).as("child_id"))
    rn.union(nc).union(ns)
  }

  /** All node ids (for degree/centrality over the full graph). */
  def nodes(s: SparkSession, d: String): DataFrame = {
    Tables.region(s, d).select(id("region", col("r_regionkey")).as("id"))
      .union(Tables.nation(s, d).select(id("nation", col("n_nationkey")).as("id")))
      .union(Tables.customer(s, d).select(id("customer", col("c_custkey")).as("id")))
      .union(Tables.supplier(s, d).select(id("supplier", col("s_suppkey")).as("id")))
  }

  private val edgesSqlCte =
    """edges AS (
      |  SELECT 'region.' || CAST(n_regionkey AS VARCHAR) AS parent_id,
      |         'nation.' || CAST(n_nationkey AS VARCHAR) AS child_id FROM nation
      |  UNION ALL
      |  SELECT 'nation.' || CAST(c_nationkey AS VARCHAR),
      |         'customer.' || CAST(c_custkey AS VARCHAR) FROM customer
      |  UNION ALL
      |  SELECT 'nation.' || CAST(s_nationkey AS VARCHAR),
      |         'supplier.' || CAST(s_suppkey AS VARCHAR) FROM supplier)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // G1: bounded BFS downstream (graph.py:42-75) — iterative frontier
    // joins with min-distance merge; deterministic (distance, id) order.
    "g1_bfs_down" -> ((s, d) => {
      import s.implicits._
      val start = Seq("region.0").toDF("id")
      Bfs.traverse(checkpointedEdges(s, d), start, depth = 2, up = false)
        .orderBy(col("distance"), col("id"))
    }),

    // G1: bounded BFS upstream from a leaf.
    "g1_bfs_up" -> ((s, d) => {
      import s.implicits._
      val start = Seq("customer.1").toDF("id")
      Bfs.traverse(checkpointedEdges(s, d), start, depth = 3, up = true)
        .orderBy(col("distance"), col("id"))
    }),

    // G5: per-node degree counts (indexer.py:458-465) restricted to
    // nation nodes for a bounded result.
    "g5_degrees" -> ((s, d) => {
      val nationNodes = Tables.nation(s, d)
        .select(id("nation", col("n_nationkey")).as("id"))
      Bfs.degrees(nationNodes, "id", edges(s, d))
        .orderBy(col("id"))
    }),

    // G6+G7: degree centrality + top-k central nodes
    // (indexer.py:466-468, graph.py:178-188).
    "g6_centrality_topk" -> ((s, d) => {
      Bfs.withCentrality(Bfs.degrees(nodes(s, d), "id", edges(s, d)))
        .select(col("id"), col("centrality"))
        .orderBy(col("centrality").desc, col("id"))
        .limit(10)
    }),

    // G8: reachability diagnosis (benchmarks/diagnose_misses.py) —
    // categorize every customer node by min distance from a pivot SET
    // (multi-seed BFS): reachable (≤2) / distant / disconnected.
    "g8_reach_diagnosis" -> ((s, d) => {
      import s.implicits._
      val start = Seq("nation.0", "nation.1").toDF("id")
      val reach = Bfs.traverse(checkpointedEdges(s, d), start, depth = 8, up = false)
      Tables.customer(s, d).select(id("customer", col("c_custkey")).as("id"))
        .join(reach, Seq("id"), "left")
        .withColumn("category",
          when(col("distance").isNull, "disconnected")
            .when(col("distance") <= 2, "reachable")
            .otherwise("distant"))
        .groupBy(col("category")).agg(count(lit(1)).as("n"))
        .orderBy(col("category"))
    }),

    // G3: impact analysis (graph.py:79-132) — downstream expansion from
    // one node, type split, count rollup, rule-based risk level.
    "g3_impact" -> ((s, d) => {
      import s.implicits._
      val start = Seq("region.1").toDF("id")
      val reach = Bfs.traverse(checkpointedEdges(s, d), start, depth = 2, up = false)
        .withColumn("node_type", split(col("id"), "\\.").getItem(0))
      reach.agg(
          sum(when(col("node_type") === "nation", 1L).otherwise(0L)).as("n_nations"),
          sum(when(col("node_type") === "customer", 1L).otherwise(0L)).as("n_customers"),
          sum(when(col("node_type") === "supplier", 1L).otherwise(0L)).as("n_suppliers"))
        .withColumn("risk",
          when(col("n_customers") > 1000, "high")
            .when(col("n_customers") > 100, "medium")
            .otherwise("low"))
    })
  )

  def oracles: Map[String, String] = Map(
    "g1_bfs_down" ->
      s"""WITH RECURSIVE $edgesSqlCte,
         |walk(id, dist) AS (
         |  SELECT 'region.0', 0
         |  UNION ALL
         |  SELECT e.child_id, w.dist + 1 FROM walk w JOIN edges e ON e.parent_id = w.id
         |  WHERE w.dist < 2)
         |SELECT id, MIN(dist) AS distance FROM walk WHERE dist > 0
         |GROUP BY id ORDER BY distance, id""".stripMargin,
    "g1_bfs_up" ->
      s"""WITH RECURSIVE $edgesSqlCte,
         |walk(id, dist) AS (
         |  SELECT 'customer.1', 0
         |  UNION ALL
         |  SELECT e.parent_id, w.dist + 1 FROM walk w JOIN edges e ON e.child_id = w.id
         |  WHERE w.dist < 3)
         |SELECT id, MIN(dist) AS distance FROM walk WHERE dist > 0
         |GROUP BY id ORDER BY distance, id""".stripMargin,
    "g5_degrees" ->
      s"""WITH $edgesSqlCte,
         |n AS (SELECT 'nation.' || CAST(n_nationkey AS VARCHAR) AS id FROM nation),
         |up AS (SELECT child_id AS id, COUNT(*) AS upstream_count FROM edges GROUP BY child_id),
         |dn AS (SELECT parent_id AS id, COUNT(*) AS downstream_count FROM edges GROUP BY parent_id)
         |SELECT n.id, COALESCE(up.upstream_count, 0) AS upstream_count,
         |       COALESCE(dn.downstream_count, 0) AS downstream_count
         |FROM n LEFT JOIN up ON n.id = up.id LEFT JOIN dn ON n.id = dn.id
         |ORDER BY n.id""".stripMargin,
    "g6_centrality_topk" ->
      s"""WITH $edgesSqlCte,
         |allnodes AS (
         |  SELECT 'region.' || CAST(r_regionkey AS VARCHAR) AS id FROM region
         |  UNION ALL SELECT 'nation.' || CAST(n_nationkey AS VARCHAR) FROM nation
         |  UNION ALL SELECT 'customer.' || CAST(c_custkey AS VARCHAR) FROM customer
         |  UNION ALL SELECT 'supplier.' || CAST(s_suppkey AS VARCHAR) FROM supplier),
         |up AS (SELECT child_id AS id, COUNT(*) AS uc FROM edges GROUP BY child_id),
         |dn AS (SELECT parent_id AS id, COUNT(*) AS dc FROM edges GROUP BY parent_id),
         |deg AS (SELECT a.id, COALESCE(uc, 0) + COALESCE(dc, 0) AS total
         |        FROM allnodes a LEFT JOIN up ON a.id = up.id LEFT JOIN dn ON a.id = dn.id),
         |m AS (SELECT MAX(total) AS mx FROM deg)
         |SELECT id, CASE WHEN mx = 0 THEN 0.0
         |                ELSE CAST(total AS DOUBLE) / CAST(mx AS DOUBLE) END AS centrality
         |FROM deg, m ORDER BY centrality DESC, id LIMIT 10""".stripMargin,
    "g8_reach_diagnosis" ->
      s"""WITH RECURSIVE $edgesSqlCte,
         |walk(id, dist) AS (
         |  SELECT id, 0 FROM (SELECT 'nation.0' AS id UNION ALL SELECT 'nation.1')
         |  UNION ALL
         |  SELECT e.child_id, w.dist + 1 FROM walk w JOIN edges e ON e.parent_id = w.id
         |  WHERE w.dist < 8),
         |reach AS (SELECT id, MIN(dist) AS distance FROM walk WHERE dist > 0 GROUP BY id),
         |cust AS (SELECT 'customer.' || CAST(c_custkey AS VARCHAR) AS id FROM customer)
         |SELECT CASE WHEN r.distance IS NULL THEN 'disconnected'
         |            WHEN r.distance <= 2 THEN 'reachable'
         |            ELSE 'distant' END AS category, COUNT(*) AS n
         |FROM cust LEFT JOIN reach r USING (id)
         |GROUP BY 1 ORDER BY category""".stripMargin,
    "g3_impact" ->
      s"""WITH RECURSIVE $edgesSqlCte,
         |walk(id, dist) AS (
         |  SELECT 'region.1', 0
         |  UNION ALL
         |  SELECT e.child_id, w.dist + 1 FROM walk w JOIN edges e ON e.parent_id = w.id
         |  WHERE w.dist < 2),
         |reach AS (SELECT id, MIN(dist) AS distance FROM walk WHERE dist > 0 GROUP BY id),
         |agg AS (SELECT
         |  CAST(SUM(CASE WHEN string_split(id, '.')[1] = 'nation' THEN 1 ELSE 0 END) AS BIGINT) AS n_nations,
         |  CAST(SUM(CASE WHEN string_split(id, '.')[1] = 'customer' THEN 1 ELSE 0 END) AS BIGINT) AS n_customers,
         |  CAST(SUM(CASE WHEN string_split(id, '.')[1] = 'supplier' THEN 1 ELSE 0 END) AS BIGINT) AS n_suppliers
         |FROM reach)
         |SELECT n_nations, n_customers, n_suppliers,
         |  CASE WHEN n_customers > 1000 THEN 'high'
         |       WHEN n_customers > 100 THEN 'medium' ELSE 'low' END AS risk
         |FROM agg""".stripMargin
  )
}
