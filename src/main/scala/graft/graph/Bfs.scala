package graft.graph

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StringType, StructField, StructType}

/** Bounded breadth-first traversal over an edge list.
  *
  * Re-expression of the reference's queue-based BFS with a visited set
  * (`/root/reference/src/ariadne_dbt/graph.py:42-75`) as an iterative
  * frontier self-join — the standard distributed BFS shape:
  *
  *   frontier(i+1) = (frontier(i) ⋈ edges) ∖ visited, min-dist merged
  *
  * Design notes for scale:
  *   - the per-iteration `groupBy(id).min(distance)` mirrors the
  *     reference's visited-set "first reach wins" semantics and caps the
  *     frontier at one row per node, preventing frontier explosion on
  *     dense DAGs;
  *   - `localCheckpoint()` each iteration truncates logical-plan lineage
  *     so a depth-10 traversal stays a flat plan instead of a
  *     2^10-node join tree;
  *   - start nodes are a DataFrame, not a driver-side list, so a
  *     million-node seed set (e.g. impact analysis over every model
  *     touched by a commit) never passes through the driver.
  */
object Bfs {

  val outputSchema: StructType = StructType(Seq(
    StructField("id", StringType, nullable = false),
    StructField("distance", IntegerType, nullable = false)))

  /** Nodes reachable from `start` in ≤ `depth` hops (start excluded),
    * with min distance per node.
    *
    * @param edges  DataFrame with `parent_id`, `child_id` string columns
    * @param start  DataFrame with an `id` string column (seed frontier)
    * @param depth  maximum hops; ≤ 0 → empty result (graph.py:55-56)
    * @param up     false = follow parent→child (downstream),
    *               true  = follow child→parent (upstream)
    */
  def traverse(edges: DataFrame, start: DataFrame, depth: Int, up: Boolean): DataFrame = {
    val spark = edges.sparkSession
    if (depth <= 0)
      return spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], outputSchema)

    val (from, to) = if (up) ("child_id", "parent_id") else ("parent_id", "child_id")
    val seeds = start.select(col("id").cast(StringType).as("id"))
      .distinct().withColumn("distance", lit(0)).localCheckpoint()

    var visited = seeds
    var frontier = seeds
    var hop = 0
    while (hop < depth && !frontier.isEmpty) {
      // lazy checkpoints: lineage still truncates (preventing the
      // 2^depth plan blowup) but materialization piggybacks on the
      // frontier-emptiness probe instead of costing its own job.
      val next = frontier.join(edges, frontier("id") === edges(from))
        .select(edges(to).as("id"), (frontier("distance") + 1).as("distance"))
        .join(visited, Seq("id"), "left_anti")
        .groupBy("id").agg(min("distance").as("distance"))
        .localCheckpoint(false)
      visited = visited.union(next).localCheckpoint(false)
      frontier = next
      hop += 1
    }
    visited.join(seeds.select("id"), Seq("id"), "left_anti")
  }

  /** Convenience: both directions, as the reference's neighbors()
    * (graph.py:34-40). Returns (id, distance, direction). */
  def neighbors(edges: DataFrame, start: DataFrame, upDepth: Int, downDepth: Int): DataFrame = {
    val u = traverse(edges, start, upDepth, up = true).withColumn("direction", lit("upstream"))
    val d = traverse(edges, start, downDepth, up = false).withColumn("direction", lit("downstream"))
    u.unionByName(d)
  }

  /** Per-node degree counts over the edge list — upstream_count = #parents,
    * downstream_count = #children (indexer.py:458-465), as two aggregations
    * joined onto the node set (no correlated subquery needed).
    */
  def degrees(nodes: DataFrame, idCol: String, edges: DataFrame): DataFrame = {
    val upC = edges.groupBy(col("child_id").as(idCol)).agg(count(lit(1)).as("upstream_count"))
    val dnC = edges.groupBy(col("parent_id").as(idCol)).agg(count(lit(1)).as("downstream_count"))
    nodes.join(upC, Seq(idCol), "left").join(dnC, Seq(idCol), "left")
      .na.fill(0L, Seq("upstream_count", "downstream_count"))
  }

  /** Degree centrality: (up+down) / max(up+down), 0 when the max is 0
    * (indexer.py:466-468 NULLIF guard). Single extra aggregation +
    * broadcast of the 1-row max — no window over the whole node set.
    */
  def withCentrality(degreed: DataFrame): DataFrame = {
    val total = degreed("upstream_count") + degreed("downstream_count")
    val mx = degreed.agg(max(col("upstream_count") + col("downstream_count")).as("max_total"))
    degreed.crossJoin(broadcast(mx))
      .withColumn("centrality",
        when(col("max_total") === 0, lit(0.0))
          .otherwise(total.cast("double") / col("max_total").cast("double")))
      .drop("max_total")
  }
}
