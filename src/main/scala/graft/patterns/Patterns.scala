package graft.patterns

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Catalog

/** Project-wide pattern mining and stats rollups
  * (`/root/reference/src/ariadne_dbt/patterns.py:14-279`).
  *
  * Single-pass aggregations throughout: the reference's per-layer SQL
  * loop for "most common materialization" becomes one groupBy + ranking
  * window; ordering artifacts SQLite hid (insertion-order GROUP_CONCAT,
  * "first" examples) are pinned with explicit sorts.
  */
class Patterns(catalog: Catalog) {

  /** Project stats rollup (patterns.py:22-53): entity counts + column
    * test coverage %, one row. */
  def stats(): DataFrame = {
    val m = catalog.models.agg(count(lit(1)).as("models"))
    val s = catalog.sources.agg(count(lit(1)).as("sources"),
      countDistinct(col("source_name")).as("source_systems"))
    val t = catalog.tests.agg(count(lit(1)).as("tests"))
    val mac = catalog.macros.agg(count(lit(1)).as("macros"))
    val e = catalog.exposures.agg(count(lit(1)).as("exposures"))
    val totalCols = catalog.columns.agg(count(lit(1)).as("total_columns"))
    val testedCols = catalog.tests.filter(col("column_name") =!= "")
      .agg(countDistinct(col("model_id"), col("column_name")).as("tested_columns"))
    m.crossJoin(s).crossJoin(t).crossJoin(mac).crossJoin(e)
      .crossJoin(totalCols).crossJoin(testedCols)
      .withColumn("column_coverage_pct",
        when(col("total_columns") === 0, 0.0)
          .otherwise(col("tested_columns").cast("double") / col("total_columns") * 100.0))
  }

  /** Model count per layer (patterns.py:133-137). */
  def layerCounts(): DataFrame =
    catalog.models.groupBy("layer").agg(count(lit(1)).as("n")).orderBy("layer")

  /** Most common materialization per layer — one ranking window
    * instead of the reference's per-layer loop (patterns.py:196-202). */
  def materializationByLayer(): DataFrame = {
    val w = Window.partitionBy(col("layer"))
      .orderBy(col("n").desc, col("materialization"))
    catalog.models.groupBy("layer", "materialization").agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1).drop("rn")
      .orderBy("layer")
  }

  /** Column test coverage per layer (patterns.py:248-266). */
  def coverageByLayer(): DataFrame = {
    val modelLayer = catalog.models.select(col("unique_id").as("model_id"), col("layer"))
    val total = catalog.columns.join(modelLayer, "model_id")
      .groupBy("layer").agg(count(lit(1)).as("total_cols"))
    val tested = catalog.tests.filter(col("column_name") =!= "")
      .select(col("model_id"), col("column_name")).distinct()
      .join(modelLayer, "model_id")
      .groupBy("layer").agg(count(lit(1)).as("tested_cols"))
    total.join(tested, Seq("layer"), "left")
      .na.fill(0L, Seq("tested_cols"))
      .withColumn("coverage_pct",
        col("tested_cols").cast("double") / col("total_cols") * 100.0)
      .orderBy("layer")
  }

  /** Top-10 tag frequencies (patterns.py:268-279). */
  def topTags(k: Int = 10): DataFrame =
    catalog.models.select(explode(col("tags")).as("tag"))
      .groupBy("tag").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tag")).limit(k)

  /** Naming-pattern inference (patterns.py:161-224): first staging
    * example pinned by name sort, separator detection, prefix booleans. */
  def naming(): DataFrame = {
    val staging = catalog.models.filter(col("layer") === "staging")
    val ex = staging.orderBy("name").limit(1)
      .agg(first(col("name")).as("staging_example"))
    val flags = catalog.models.agg(
      max(when(col("layer") === "staging" && col("name").contains("__"), 1).otherwise(0))
        .cast("boolean").as("uses_double_underscore"),
      max(when(col("name").startsWith("int_"), 1).otherwise(0)).cast("boolean").as("has_int_prefix"),
      max(when(col("name").startsWith("fct_"), 1).otherwise(0)).cast("boolean").as("has_fct_prefix"),
      max(when(col("name").startsWith("dim_"), 1).otherwise(0)).cast("boolean").as("has_dim_prefix"))
    flags.crossJoin(ex)
  }

  /** Example model per layer: most columns, longest description wins
    * (patterns.py:72-86). */
  def examplePerLayer(): DataFrame = {
    val colCount = catalog.columns.groupBy(col("model_id").as("unique_id"))
      .agg(count(lit(1)).as("n_cols"))
    val w = Window.partitionBy(col("layer"))
      .orderBy(col("n_cols").desc, length(col("description")).desc, col("unique_id"))
    catalog.models.join(colCount, Seq("unique_id"), "left")
      .na.fill(0L, Seq("n_cols"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("layer"), col("unique_id"), col("name"), col("n_cols"))
      .orderBy("layer")
  }
}
