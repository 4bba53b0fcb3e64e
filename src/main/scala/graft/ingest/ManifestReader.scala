package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.graph.Bfs
import graft.model.Catalog

/** dbt `manifest.json` → relational catalog, as a distributed read.
  *
  * Re-expression of the reference's serial parser
  * (`/root/reference/src/ariadne_dbt/indexer.py:72-98,178-321`):
  * `spark.read.option("multiLine", true)` with an EXPLICIT schema whose
  * `nodes`/`sources`/`macros`/`exposures`/`parent_map` are MapType —
  * schema inference would materialize one struct field per unique_id.
  * The defensive `.get(..., default)` chains of the reference become
  * `coalesce` over alternate key columns (raw_code|raw_sql, …).
  *
  * A 75 MB manifest (the reference's stated ceiling, README.md:13)
  * parses in one task; the downstream relations distribute from there.
  * Ingestion is full-replace and therefore idempotent, matching
  * `indexer.py:326` semantics — writers use mode("overwrite").
  */
object ManifestReader {

  // ── Schema (only the fields the catalog keeps) ──────────────────────

  private val columnSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("description", StringType),
    StructField("data_type", StringType),
    StructField("tags", ArrayType(StringType))))

  private val nodeSchema = StructType(Seq(
    StructField("resource_type", StringType),
    StructField("name", StringType),
    StructField("fqn", ArrayType(StringType)),
    StructField("package_name", StringType),
    StructField("database", StringType),
    StructField("schema", StringType),
    StructField("alias", StringType),
    StructField("original_file_path", StringType),
    StructField("raw_code", StringType),
    StructField("raw_sql", StringType),
    StructField("compiled_code", StringType),
    StructField("compiled_sql", StringType),
    StructField("language", StringType),
    StructField("description", StringType),
    StructField("tags", ArrayType(StringType)),
    StructField("config", StructType(Seq(
      StructField("materialized", StringType),
      StructField("severity", StringType),
      StructField("tags", ArrayType(StringType))))),
    StructField("depends_on", StructType(Seq(
      StructField("nodes", ArrayType(StringType))))),
    StructField("refs", ArrayType(StructType(Seq(
      StructField("name", StringType))))),
    StructField("sources", ArrayType(ArrayType(StringType))),
    StructField("columns", MapType(StringType, columnSchema)),
    StructField("test_metadata", StructType(Seq(
      StructField("name", StringType),
      StructField("kwargs", StructType(Seq(
        StructField("column_name", StringType)))))))))

  private val sourceSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("source_name", StringType),
    StructField("schema", StringType),
    StructField("database", StringType),
    StructField("description", StringType),
    StructField("loader", StringType),
    StructField("columns", MapType(StringType, columnSchema))))

  private val macroSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("package_name", StringType),
    StructField("original_file_path", StringType),
    StructField("description", StringType),
    StructField("macro_sql", StringType)))

  private val exposureSchema = StructType(Seq(
    StructField("name", StringType),
    StructField("label", StringType),
    StructField("type", StringType),
    StructField("url", StringType),
    StructField("description", StringType),
    StructField("owner", StructType(Seq(
      StructField("name", StringType),
      StructField("email", StringType)))),
    StructField("depends_on", StructType(Seq(
      StructField("nodes", ArrayType(StringType))))),
    StructField("tags", ArrayType(StringType))))

  val manifestSchema: StructType = StructType(Seq(
    StructField("metadata", StructType(Seq(
      StructField("dbt_schema_version", StringType),
      StructField("dbt_version", StringType),
      StructField("adapter_type", StringType),
      StructField("project_name", StringType),
      StructField("generated_at", StringType)))),
    StructField("nodes", MapType(StringType, nodeSchema)),
    StructField("sources", MapType(StringType, sourceSchema)),
    StructField("macros", MapType(StringType, macroSchema)),
    StructField("exposures", MapType(StringType, exposureSchema)),
    StructField("parent_map", MapType(StringType, ArrayType(StringType)))))

  // ── Layer detection (indexer.py:22-36) ──────────────────────────────

  private val layerKeywords = Seq(
    "staging" -> Seq("staging", "stg"),
    "intermediate" -> Seq("intermediate", "int"),
    "marts" -> Seq("marts", "mart", "fct", "dim", "agg", "rpt", "report"))

  /** candidates = lower(fqn[1:]) ∪ {lower(name)} ∪ lower(config.tags);
    * a layer matches when any candidate startsWith(kw) or contains
    * "/"+kw (startswith subsumes equality). */
  def layerColumn(fqn: Column, name: Column, configTags: Column): Column = {
    val candidates = concat(
      transform(slice(fqn, lit(2), greatest(size(fqn) - 1, lit(0))), lower _),
      array(lower(name)),
      transform(coalesce(configTags, array().cast("array<string>")), lower _))
    def matches(kws: Seq[String]): Column =
      exists(candidates, c =>
        kws.map(kw => c.startsWith(kw) || c.contains("/" + kw)).reduce(_ || _))
    layerKeywords.foldLeft(lit(null).cast("string")) { case (acc, (layer, kws)) =>
      coalesce(acc, when(matches(kws), layer))
    }.alias("layer")
  }

  // ── Readers ─────────────────────────────────────────────────────────

  def readRaw(spark: SparkSession, path: String): DataFrame =
    spark.read.option("multiLine", value = true).schema(manifestSchema).json(path)

  /** Parse + derive the full catalog (edges, degrees, centrality,
    * search index) from one manifest file. */
  def read(spark: SparkSession, path: String): Catalog = {
    val raw = readRaw(spark, path).cache()

    val metadata = raw.select(explode(map_from_arrays(
      array(lit("dbt_schema_version"), lit("dbt_version"), lit("adapter_type"),
        lit("project_name"), lit("generated_at")),
      array(col("metadata.dbt_schema_version"), col("metadata.dbt_version"),
        col("metadata.adapter_type"), col("metadata.project_name"),
        col("metadata.generated_at"))))).toDF("key", "value")

    val nodes = raw.select(explode(col("nodes")).as(Seq("unique_id", "n"))).cache()

    val modelsBase = nodes.filter(col("n.resource_type") === "model").select(
      col("unique_id"),
      coalesce(col("n.name"), lit("")).as("name"),
      coalesce(col("n.fqn"), array().cast("array<string>")).as("fqn"),
      coalesce(col("n.package_name"), lit("")).as("package_name"),
      coalesce(col("n.database"), lit("")).as("database"),
      coalesce(col("n.schema"), lit("")).as("schema"),
      coalesce(col("n.alias"), col("n.name"), lit("")).as("alias"),
      coalesce(col("n.original_file_path"), lit("")).as("file_path"),
      coalesce(col("n.raw_code"), col("n.raw_sql"), lit("")).as("raw_code"),
      coalesce(col("n.compiled_code"), col("n.compiled_sql"), lit("")).as("compiled_code"),
      coalesce(col("n.language"), lit("sql")).as("language"),
      coalesce(col("n.description"), lit("")).as("description"),
      layerColumn(coalesce(col("n.fqn"), array().cast("array<string>")),
        coalesce(col("n.name"), lit("")), col("n.config.tags")),
      coalesce(col("n.config.materialized"), lit("view")).as("materialization"),
      concat(coalesce(col("n.tags"), array().cast("array<string>")),
        coalesce(col("n.config.tags"), array().cast("array<string>"))).as("tags"),
      coalesce(col("n.depends_on.nodes"), array().cast("array<string>")).as("depends_on_nodes"),
      transform(coalesce(col("n.refs"), array().cast("array<struct<name:string>>")),
        r => r.getField("name")).as("refs"),
      transform(coalesce(col("n.sources"), array().cast("array<array<string>>")),
        s => concat_ws(".", s)).as("sources"),
      col("n.columns").as("columns_map"))

    val columns = modelsBase
      .select(col("unique_id").as("model_id"), explode(col("columns_map")).as(Seq("cname", "c")))
      .select(col("model_id"),
        coalesce(col("c.name"), col("cname")).as("name"),
        coalesce(col("c.data_type"), lit("")).as("data_type"),
        coalesce(col("c.description"), lit("")).as("description"),
        coalesce(col("c.tags"), array().cast("array<string>")).as("tags"))

    val tests = nodes.filter(col("n.resource_type") === "test").select(
      col("unique_id"),
      coalesce(col("n.name"), lit("")).as("name"),
      lower(coalesce(col("n.test_metadata.name"), col("n.name"), lit(""))).as("tt_raw"),
      col("n.test_metadata").isNotNull.as("has_meta"),
      element_at(filter(coalesce(col("n.depends_on.nodes"), array().cast("array<string>")),
        d => d.startsWith("model.")), 1).as("model_id"),
      coalesce(col("n.test_metadata.kwargs.column_name"), lit("")).as("column_name"),
      coalesce(col("n.config.severity"), lit("error")).as("severity"))
      .withColumn("test_type",
        when(col("tt_raw").isin("not_null", "unique", "accepted_values", "relationships"), col("tt_raw"))
          .when(col("has_meta"), "generic").otherwise("singular"))
      .drop("tt_raw", "has_meta")

    val sources = raw.select(explode(col("sources")).as(Seq("unique_id", "s"))).select(
      col("unique_id"),
      coalesce(col("s.name"), lit("")).as("name"),
      coalesce(col("s.source_name"), lit("")).as("source_name"),
      coalesce(col("s.schema"), lit("")).as("schema"),
      coalesce(col("s.database"), lit("")).as("database"),
      coalesce(col("s.description"), lit("")).as("description"),
      coalesce(col("s.loader"), lit("")).as("loader"))

    val macros = raw.select(explode(col("macros")).as(Seq("unique_id", "m"))).select(
      col("unique_id"),
      coalesce(col("m.name"), lit("")).as("name"),
      coalesce(col("m.package_name"), lit("")).as("package_name"),
      coalesce(col("m.original_file_path"), lit("")).as("file_path"),
      coalesce(col("m.description"), lit("")).as("description"),
      coalesce(col("m.macro_sql"), lit("")).as("macro_sql"))

    val exposures = raw.select(explode(col("exposures")).as(Seq("unique_id", "e"))).select(
      col("unique_id"),
      coalesce(col("e.name"), lit("")).as("name"),
      coalesce(col("e.label"), lit("")).as("label"),
      coalesce(col("e.type"), lit("")).as("type"),
      coalesce(col("e.url"), lit("")).as("url"),
      coalesce(col("e.description"), lit("")).as("description"),
      coalesce(col("e.owner.name"), lit("")).as("owner_name"),
      coalesce(col("e.owner.email"), lit("")).as("owner_email"),
      coalesce(col("e.depends_on.nodes"), array().cast("array<string>")).as("depends_on"),
      coalesce(col("e.tags"), array().cast("array<string>")).as("tags"))

    // Edge build (indexer.py:447-456): invert parent_map, keep
    // model/source parents and model/source/exposure/test children.
    val edges = raw
      .select(explode(col("parent_map")).as(Seq("child_id", "parents")))
      .select(col("child_id"), explode(col("parents")).as("parent_id"))
      .filter((col("parent_id").startsWith("model.") || col("parent_id").startsWith("source.")) &&
        (col("child_id").startsWith("model.") || col("child_id").startsWith("source.") ||
          col("child_id").startsWith("exposure.") || col("child_id").startsWith("test.")))
      .select(col("parent_id"), col("child_id"))
      .distinct()

    // Degrees + centrality (indexer.py:458-468).
    val models = Bfs.withCentrality(
      Bfs.degrees(modelsBase.drop("columns_map"), "unique_id", edges))

    // PK/FK inference (indexer.py:400-417): PK needs both unique and
    // not_null test types on the column; FK needs a relationships test.
    val colTests = tests.filter(col("column_name") =!= "")
      .select(col("model_id"), col("column_name"), col("test_type"))
    val flags = colTests.groupBy("model_id", "column_name").agg(
      (size(array_intersect(collect_set(col("test_type")),
        array(lit("unique"), lit("not_null")))) >= 2).as("is_primary_key"),
      array_contains(collect_set(col("test_type")), "relationships").as("is_foreign_key"))
    val columnsFlagged = columns
      .join(flags, columns("model_id") === flags("model_id") &&
        columns("name") === flags("column_name"), "left")
      .select(columns("model_id"), columns("name"), col("data_type"),
        col("description"), col("tags"),
        coalesce(col("is_primary_key"), lit(false)).as("is_primary_key"),
        coalesce(col("is_foreign_key"), lit(false)).as("is_foreign_key"))

    // FTS document build (indexer.py:471-485); column order pinned by
    // sort for determinism where SQLite relied on insertion order.
    val colNames = columns.groupBy(col("model_id").as("unique_id"))
      .agg(concat_ws(" ", sort_array(collect_list(col("name")))).as("column_names"))
    val searchIndex = modelsBase.drop("columns_map")
      .join(colNames, Seq("unique_id"), "left")
      .select(col("unique_id"), col("name"), col("description"),
        coalesce(col("column_names"), lit("")).as("column_names"),
        substring(coalesce(when(col("compiled_code") =!= "", col("compiled_code")),
          col("raw_code"), lit("")), 1, 2000).as("sql_text"),
        concat_ws(" ", col("tags")).as("tags_text"))

    Catalog(metadata, models, columnsFlagged, tests, sources, macros,
      exposures, edges, searchIndex).cacheAll()
  }
}
