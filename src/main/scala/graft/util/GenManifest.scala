package graft.util

import java.nio.file.{Files, Path}

/** Deterministic synthetic dbt manifest generator — the serving-tier
  * benchmark workload (the reference benchmarks against a ~500-model
  * project, `/root/reference/benchmarks/run.py:16-41`). A chained
  * project: model i depends on model i-1, staging models on a source,
  * layers split evenly staging/intermediate/marts. Shared by PerfSpec
  * (regression guard) and [[graft.BenchServe]] (committed artifact) so
  * both measure the identical workload.
  */
object GenManifest {

  /** Write a manifest.json for an `nModels`-model chained project under
    * a fresh temp dir; returns its path. */
  def write(nModels: Int): String = {
    val f = Files.createTempDirectory("graft_genmanifest").resolve("manifest.json")
    Files.writeString(f, json(nModels))
    f.toString
  }

  def json(nModels: Int): String = {
    val layers = Seq("staging", "intermediate", "marts")
    def uid(i: Int) = s"model.gen.m_$i"
    def layerOf(i: Int) = layers(i * layers.size / nModels)
    def name(i: Int) = layerOf(i) match {
      case "staging" => s"stg_model_$i"
      case "intermediate" => s"int_model_$i"
      case _ => s"fct_model_$i"
    }
    val nodes = (0 until nModels).map { i =>
      val deps = if (i == 0) "\"source.gen.raw.seed\"" else s""""${uid(i - 1)}""""
      s""""${uid(i)}": {
         |  "resource_type": "model", "name": "${name(i)}",
         |  "fqn": ["gen", "${layerOf(i)}", "${name(i)}"],
         |  "package_name": "gen", "schema": "${layerOf(i)}",
         |  "original_file_path": "models/${layerOf(i)}/${name(i)}.sql",
         |  "raw_code": "select id, value_$i as metric from upstream_$i where flag = true",
         |  "compiled_code": "select id, value_$i as metric from upstream_$i where flag = true",
         |  "description": "Generated model number $i computing metric $i over ids.",
         |  "tags": ["gen"], "config": {"materialized": "view", "tags": []},
         |  "depends_on": {"nodes": [$deps]}, "refs": [], "sources": [],
         |  "columns": {
         |    "id": {"name": "id", "description": "key", "data_type": "bigint", "tags": []},
         |    "metric": {"name": "metric", "description": "value", "data_type": "double", "tags": []}
         |  }
         |}""".stripMargin
    }.mkString(",\n")
    val parentMap = (0 until nModels).map { i =>
      val p = if (i == 0) "\"source.gen.raw.seed\"" else s""""${uid(i - 1)}""""
      s""""${uid(i)}": [$p]"""
    }.mkString(",\n")
    s"""{
       |"metadata": {"dbt_schema_version": "v12", "dbt_version": "1.8.0",
       |  "adapter_type": "spark", "project_name": "gen", "generated_at": "2026-01-01T00:00:00Z"},
       |"nodes": {$nodes},
       |"sources": {"source.gen.raw.seed": {"name": "seed", "source_name": "raw",
       |  "schema": "raw", "database": "lake", "description": "seed", "loader": "x", "columns": {}}},
       |"macros": {}, "exposures": {},
       |"parent_map": {$parentMap}
       |}""".stripMargin
  }
}
