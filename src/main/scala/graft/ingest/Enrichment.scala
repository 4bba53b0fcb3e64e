package graft.ingest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Catalog

/** catalog.json / run_results.json enrichment
  * (`/root/reference/src/ariadne_dbt/indexer.py:100-160,489-504`).
  *
  * Both are left-join updates onto the already-ingested catalog —
  * `coalesce(new, old)` in place of the reference's per-row UPDATEs —
  * with the same defensive key fallbacks (`num_rows`|`row_count`,
  * `num_bytes`|`bytes`) and case-insensitive column-name matching.
  */
object Enrichment {

  private val statValue = StructType(Seq(StructField("value", StringType)))

  val catalogSchema: StructType = StructType(Seq(
    StructField("nodes", MapType(StringType, StructType(Seq(
      StructField("columns", MapType(StringType, StructType(Seq(
        StructField("name", StringType),
        StructField("type", StringType))))),
      StructField("stats", StructType(Seq(
        StructField("num_rows", statValue),
        StructField("row_count", statValue),
        StructField("num_bytes", statValue),
        StructField("bytes", statValue))))))))))

  val runResultsSchema: StructType = StructType(Seq(
    StructField("results", ArrayType(StructType(Seq(
      StructField("unique_id", StringType),
      StructField("status", StringType),
      StructField("failures", LongType),
      StructField("timing", ArrayType(StructType(Seq(
        StructField("name", StringType),
        StructField("started_at", StringType),
        StructField("completed_at", StringType)))))))))))

  /** Enrich models with row counts / byte sizes and columns with
    * warehouse types from catalog.json. */
  def withCatalog(cat: Catalog, spark: SparkSession, path: String): Catalog = {
    val raw = spark.read.option("multiLine", value = true).schema(catalogSchema).json(path)
    val nodes = raw.select(explode(col("nodes")).as(Seq("unique_id", "n"))).cache()

    val stats = nodes.select(col("unique_id"),
      coalesce(col("n.stats.num_rows.value"), col("n.stats.row_count.value"))
        .cast("long").as("row_count"),
      coalesce(col("n.stats.num_bytes.value"), col("n.stats.bytes.value"))
        .cast("long").as("bytes"))

    val catCols = nodes
      .select(col("unique_id").as("model_id"), explode(col("n.columns")).as(Seq("cname", "c")))
      .select(col("model_id"), lower(coalesce(col("c.name"), col("cname"))).as("lname"),
        col("c.type").as("catalog_type"))

    val models = cat.models.join(stats, Seq("unique_id"), "left")
    val columns = cat.columns
      .join(catCols,
        cat.columns("model_id") === catCols("model_id") &&
          lower(cat.columns("name")) === catCols("lname"),
        "left")
      .select(cat.columns("model_id"), cat.columns("name"),
        // catalog (actual warehouse) type wins over the manifest's
        when(col("catalog_type").isNotNull && col("catalog_type") =!= "", col("catalog_type"))
          .otherwise(cat.columns("data_type")).as("data_type"),
        col("description"), col("tags"), col("is_primary_key"), col("is_foreign_key"))

    cat.copy(models = models.cache(), columns = columns.cache())
  }

  /** Enrich tests with last run status / execution time / failures
    * from run_results.json (only `test.*` results are relevant). */
  def withRunResults(cat: Catalog, spark: SparkSession, path: String): Catalog = {
    val raw = spark.read.option("multiLine", value = true).schema(runResultsSchema).json(path)
    val results = raw.select(explode(col("results")).as("r"))
      .filter(col("r.unique_id").startsWith("test."))
      .select(col("r.unique_id").as("unique_id"),
        col("r.status").as("last_status"),
        col("r.failures").as("last_failures"),
        // Σ(completed - started) over the timing array, in seconds.
        aggregate(
          coalesce(col("r.timing"),
            array().cast("array<struct<name:string,started_at:string,completed_at:string>>")),
          lit(0.0),
          (acc, t) => acc +
            (unix_millis(to_timestamp(t.getField("completed_at"))) -
              unix_millis(to_timestamp(t.getField("started_at")))).cast("double") / 1000.0)
          .as("last_execution_time"))

    cat.copy(tests = cat.tests.join(results, Seq("unique_id"), "left").cache())
  }
}
