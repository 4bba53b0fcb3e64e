package graft.ingest

import org.apache.spark.sql.SaveMode

import graft.model.Catalog

/** Catalog persistence — the reference's DELETE + INSERT full-refresh
  * sinks (`/root/reference/src/ariadne_dbt/indexer.py:325-456`, S9)
  * become overwrite-mode parquet writes, idempotent by construction.
  *
  * Models partition by `layer`: the catalog's dominant access patterns
  * (layer filters in search, per-layer pattern mining) then prune
  * partitions at scan time. The other relations are small and stay
  * unpartitioned — partitioning tiny tables just multiplies files.
  */
object Writer {

  def write(cat: Catalog, baseDir: String): Unit = {
    cat.metadata.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/metadata")
    cat.models.write.mode(SaveMode.Overwrite)
      .partitionBy("layer").parquet(s"$baseDir/models")
    cat.columns.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/columns")
    cat.tests.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/tests")
    cat.sources.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/sources")
    cat.macros.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/macros")
    cat.exposures.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/exposures")
    cat.edges.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/edges")
    cat.searchIndex.write.mode(SaveMode.Overwrite).parquet(s"$baseDir/search_index")
  }

  def read(spark: org.apache.spark.sql.SparkSession, baseDir: String): Catalog =
    Catalog(
      metadata = spark.read.parquet(s"$baseDir/metadata"),
      models = spark.read.parquet(s"$baseDir/models"),
      columns = spark.read.parquet(s"$baseDir/columns"),
      tests = spark.read.parquet(s"$baseDir/tests"),
      sources = spark.read.parquet(s"$baseDir/sources"),
      macros = spark.read.parquet(s"$baseDir/macros"),
      exposures = spark.read.parquet(s"$baseDir/exposures"),
      edges = spark.read.parquet(s"$baseDir/edges"),
      searchIndex = spark.read.parquet(s"$baseDir/search_index"))
}
