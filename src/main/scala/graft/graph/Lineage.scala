package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.Catalog

/** DAG analytics over the catalog edge list — lineage, impact, source
  * dependencies, centrality ranking
  * (`/root/reference/src/ariadne_dbt/graph.py:10-188`).
  * Traversal itself is [[Bfs]]; this layer adds the enrichment joins
  * the reference does with per-node loops (`server.py:272-300`) —
  * replaced by joins so a million-node reach set never touches the
  * driver.
  */
class Lineage(catalog: Catalog) {

  private def spark: SparkSession = catalog.edges.sparkSession

  private def seed(id: String): DataFrame = {
    val s = spark
    import s.implicits._
    Seq(id).toDF("id")
  }

  /** Upstream traversal with distances, enriched with model fields. */
  def upstream(id: String, depth: Int): DataFrame =
    enrich(Bfs.traverse(catalog.edges, seed(id), depth, up = true))

  /** Downstream traversal with distances. */
  def downstream(id: String, depth: Int): DataFrame =
    enrich(Bfs.traverse(catalog.edges, seed(id), depth, up = false))

  /** Both directions tagged with direction, ordered (direction,
    * distance, id) — `get_lineage` (server.py:240-307). */
  def lineage(id: String, upDepth: Int, downDepth: Int): DataFrame =
    enrich(Bfs.neighbors(catalog.edges, seed(id), upDepth, downDepth))
      .orderBy(col("direction"), col("distance"), col("id"))

  private def enrich(reach: DataFrame): DataFrame =
    reach.join(
      catalog.models.select(col("unique_id").as("id"), col("name"),
        col("layer"), col("materialization")),
      Seq("id"), "left")

  /** Impact analysis (graph.py:79-132): downstream reach split by node
    * type, test count via semi-join, rule-based risk level. */
  def impact(id: String, depth: Int = 5): DataFrame = {
    val reach = Bfs.traverse(catalog.edges, seed(id), math.min(depth, 10), up = false)
    val modelsReached = reach.filter(col("id").startsWith("model."))
    val exposuresReached = reach.filter(col("id").startsWith("exposure."))
    val testsReached = catalog.tests
      .join(modelsReached.select(col("id").as("model_id")), Seq("model_id"), "left_semi")
    val martsCnt = modelsReached
      .join(catalog.models.select(col("unique_id").as("id"), col("layer")), Seq("id"))
      .agg(coalesce(sum(when(col("layer") === "marts", 1L).otherwise(0L)), lit(0L)).as("n_marts"))

    modelsReached.agg(count(lit(1)).as("n_models"))
      .crossJoin(exposuresReached.agg(count(lit(1)).as("n_exposures")))
      .crossJoin(testsReached.agg(count(lit(1)).as("n_tests")))
      .crossJoin(martsCnt)
      .withColumn("risk",
        when(col("n_exposures") > 0 || (col("n_marts") > 0 && col("n_models") > 5), "high")
          .when(col("n_models") > 3 || col("n_marts") > 0, "medium")
          .otherwise("low"))
  }

  /** Source dependencies (graph.py:136-150): upstream depth 10, keep
    * source.* ids, enrich from sources. */
  def sourceDeps(id: String): DataFrame =
    Bfs.traverse(catalog.edges, seed(id), 10, up = true)
      .filter(col("id").startsWith("source."))
      .join(catalog.sources.withColumnRenamed("unique_id", "id"), Seq("id"))
      .select(col("id"), col("name"), col("source_name"), col("distance"))
      .orderBy(col("distance"), col("id"))

  /** Top-k models by centrality (graph.py:178-188). */
  def topCentral(k: Int = 10): DataFrame =
    catalog.models
      .select(col("unique_id"), col("name"), col("layer"),
        col("centrality"), col("downstream_count"))
      .orderBy(col("centrality").desc, col("downstream_count").desc, col("unique_id"))
      .limit(k)
}
