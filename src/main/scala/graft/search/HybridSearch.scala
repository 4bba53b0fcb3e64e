package graft.search

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._

import graft.model.Catalog

/** Hybrid model search: field-weighted BM25 recall + graph-centrality
  * re-ranking — the Spark re-expression of the reference's FTS5
  * pipeline (`/root/reference/src/ariadne_dbt/search.py:48-126`).
  *
  * Index = posting-list DataFrame `(term, unique_id, field, tf,
  * fieldlen)` built once per catalog with explode(stem(tokenize())) and
  * cached; a query is then a broadcast join of its term set against the
  * postings. Field weights ×5/×3/×2/×1/×1 mirror
  * `-bm25(search_index, 5,3,2,1,1)`.
  *
  * Exact FTS5 score parity is out of scope (different length
  * accounting); the reference's own tests assert recall/ordering
  * properties, which this preserves (SURVEY.md §7.5).
  */
class HybridSearch(catalog: Catalog) {

  import HybridSearch._

  /** field → BM25 weight (schema.sql:202-210 column order). */
  private val fieldWeights = Seq(
    "name" -> 5.0, "description" -> 3.0, "column_names" -> 2.0,
    "sql_text" -> 1.0, "tags_text" -> 1.0)

  /** Posting lists over all five index fields, stemmed. The stem UDF
    * is applied on the exploded column (Spark disallows UDF calls
    * inside higher-order-function lambdas). */
  lazy val postings: DataFrame = {
    val perField = fieldWeights.map { case (field, _) =>
      catalog.searchIndex
        .select(col("unique_id"), lit(field).as("field"),
          split(lower(regexp_replace(col(field), "[^A-Za-z0-9\\s]", " ")), "\\s+").as("toks"))
        .select(col("unique_id"), col("field"),
          size(filter(col("toks"), t => length(t) > 0)).as("fieldlen"),
          explode(col("toks")).as("tok"))
        .filter(length(col("tok")) > 0)
        .select(col("unique_id"), col("field"), col("fieldlen"),
          stemUdf(col("tok")).as("term"))
    }
    perField.reduce(_ unionByName _)
      .groupBy("unique_id", "field", "fieldlen", "term")
      .agg(count(lit(1)).as("tf"))
      .cache()
  }

  /** Weighted multi-field BM25 for an OR-semantics stemmed term set:
    * Σ_field weight_f · Σ_term idf·tf/(tf + k1(1-b+b·len/avglen)). */
  def bm25(terms: Seq[String]): DataFrame = {
    val spark = catalog.searchIndex.sparkSession
    import spark.implicits._
    if (terms.isEmpty) return Seq.empty[(String, Double)].toDF("unique_id", "bm25_score")
    val q = terms.distinct.toDF("term")
    val n = catalog.searchIndex.count().toDouble
    val avgLen = postings.select(col("unique_id"), col("field"), col("fieldlen")).distinct()
      .groupBy("field").agg(avg("fieldlen").as("avglen"))
    val dfs = postings.groupBy("term", "field").agg(countDistinct("unique_id").as("df"))
    val weightMap = typedLit(fieldWeights.toMap)

    postings
      .join(broadcast(q), "term")
      .join(broadcast(dfs), Seq("term", "field"))
      .join(broadcast(avgLen), "field")
      .select(col("unique_id"),
        (element_at(weightMap, col("field")) *
          log(lit(1.0) + (lit(n) - col("df") + 0.5) / (col("df") + 0.5)) *
          (col("tf") / (col("tf") +
            lit(K1) * (lit(1.0) - B + lit(B) * col("fieldlen") / col("avglen"))))).as("s"))
      .groupBy("unique_id").agg(sum("s").as("bm25_score"))
  }

  /** Full hybrid search (search.py:54-104): distributed BM25 recall at
    * 4×limit, LIKE fallback when empty, then driver-side re-ranking
    * (exclusion, min-max normalize, 0.55/0.20/0.10/0.15 blend) over the
    * collected candidate set — which is bounded by 4×limit ≤ 200 rows,
    * exactly the reference's two-phase design. One Spark job per
    * search instead of three evaluations of the scoring pipeline. */
  def search(query: String, intent: String = "explore", limit: Int = 10,
      excludeIds: Seq[String] = Nil): DataFrame = {
    val spark = catalog.models.sparkSession
    import spark.implicits._
    val terms = tokenizeQuery(query)
    val m = catalog.models.select(col("unique_id"), col("name"), col("layer"),
      col("description"), col("centrality"))

    var cands =
      if (terms.isEmpty) Array.empty[org.apache.spark.sql.Row]
      else bm25(terms)
        .join(m, "unique_id")
        .orderBy(col("bm25_score").desc, col("unique_id"))
        .limit(limit * 4)
        .collect()
    if (cands.isEmpty) // LIKE fallback (search.py:130-144)
      cands = m.filter(lower(col("name")).contains(query.toLowerCase) ||
          lower(col("description")).contains(query.toLowerCase))
        .withColumn("bm25_score", lit(0.5))
        .select(col("unique_id"), col("bm25_score"), col("name"), col("layer"),
          col("description"), col("centrality"))
        .orderBy(col("centrality").desc, col("unique_id"))
        .limit(limit * 4)
        .collect()

    val excl = excludeIds.toSet
    val kept = cands.filterNot(r => excl(r.getAs[String]("unique_id")))
    val scores = kept.map(_.getAs[Double]("bm25_score"))
    val (mn, mx) = if (scores.isEmpty) (0.0, 0.0) else (scores.min, scores.max)
    val layerW = intentLayerWeights.getOrElse(intent, Map.empty[String, Double])
    val qLower = query.toLowerCase

    val ranked = kept.map { r =>
      val bm = r.getAs[Double]("bm25_score")
      val norm = if (mx == mn) 1.0 else (bm - mn) / (mx - mn)
      val centrality = Option(r.getAs[java.lang.Double]("centrality")).map(_.toDouble).getOrElse(0.0)
      val layer = Option(r.getAs[String]("layer")).getOrElse("other")
      val layerBoost = layerW.getOrElse(layer, 0.0)
      val nameBonus = if (r.getAs[String]("name").toLowerCase.contains(qLower)) 0.15 else 0.0
      (r.getAs[String]("unique_id"), r.getAs[String]("name"), layer,
        Option(r.getAs[String]("description")).getOrElse(""), bm, centrality,
        layerBoost, nameBonus,
        norm * 0.55 + centrality * 0.20 + layerBoost * 0.10 + nameBonus * 0.15)
    }.sortBy { case (uid, _, _, _, _, _, _, _, score) => (-score, uid) }
      .take(limit).toSeq

    ranked.toDF("unique_id", "name", "layer", "description", "bm25_score",
      "centrality", "layer_boost", "name_bonus", "score")
  }

  /** Batched per-model macro containment (one job for a pivot set). */
  def macrosForModels(modelIds: Seq[String]): DataFrame = {
    val sqls = catalog.models.filter(col("unique_id").isin(modelIds: _*))
      .select(col("unique_id").as("model_id"),
        coalesce(when(col("compiled_code") =!= "", col("compiled_code")),
          col("raw_code"), lit("")).as("sql_text"))
    catalog.macros.crossJoin(broadcast(sqls))
      .filter(col("name") =!= "" && instr(col("sql_text"), col("name")) > 0)
      .select(col("model_id"), col("unique_id"), col("name"),
        col("package_name"), col("description"))
      .orderBy(col("model_id"), col("name"))
  }

  /** Batched direct upstream sources for a pivot set. */
  def sourcesForModels(modelIds: Seq[String]): DataFrame =
    catalog.edges.filter(col("child_id").isin(modelIds: _*))
      .join(catalog.sources, col("parent_id") === catalog.sources("unique_id"))
      .select(col("child_id").as("model_id"), catalog.sources("unique_id"),
        col("name"), col("source_name"))
      .orderBy(col("model_id"), col("unique_id"))

  // ── Finders / lookups (search.py:148-328) ───────────────────────────

  /** Models having a column whose name contains `columnName` (O6). */
  def findByColumn(columnName: String, limit: Int = 10): DataFrame =
    catalog.columns.filter(lower(col("name")).contains(columnName.toLowerCase))
      .select(col("model_id").as("unique_id")).distinct()
      .join(catalog.models, "unique_id")
      .select(col("unique_id"), col("name"), col("layer"), col("file_path"), col("centrality"))
      .orderBy(col("centrality").desc, col("unique_id"))
      .limit(limit)

  /** Models under a path LIKE pattern (O7); '%' supplied by caller. */
  def findByPath(pattern: String, limit: Int = 20): DataFrame =
    catalog.models.filter(col("file_path").like(pattern))
      .select(col("unique_id"), col("name"), col("layer"), col("file_path"))
      .orderBy(col("name")).limit(limit)

  /** Point lookup by case-insensitive name, else by unique_id (O8). */
  def lookup(nameOrId: String): DataFrame = {
    val byName = catalog.models.filter(lower(col("name")) === nameOrId.toLowerCase)
    val byId = catalog.models.filter(col("unique_id") === nameOrId)
    if (byName.isEmpty) byId else byName
  }

  /** File-path resolution (P6): exact file_path match unioned with
    * case-insensitive basename-minus-.sql name match; yml skipped. */
  def resolvePaths(paths: Seq[String]): DataFrame = {
    val spark = catalog.models.sparkSession
    import spark.implicits._
    val keep = paths.filterNot(p => p.endsWith(".yml") || p.endsWith(".yaml"))
    val pdf = keep.toDF("p")
      .withColumn("base", regexp_replace(element_at(split(col("p"), "/"), -1), "\\.sql$", ""))
    val exact = catalog.models.join(pdf, col("file_path") === col("p"))
    val byName = catalog.models.join(pdf, lower(col("name")) === lower(col("base")))
    exact.select(col("unique_id")).union(byName.select(col("unique_id"))).distinct()
  }

  /** Columns of a model with their attached test types (O9). */
  def columnsWithTests(modelId: String): DataFrame = {
    val cols = catalog.columns.filter(col("model_id") === modelId)
    val ts = catalog.tests.filter(col("model_id") === modelId && col("column_name") =!= "")
      .groupBy(col("column_name").as("name"))
      .agg(sort_array(collect_list(col("test_type"))).as("tests"))
    cols.join(ts, Seq("name"), "left")
      .select(col("name"), col("data_type"), col("description"),
        coalesce(col("tests"), array().cast("array<string>")).as("tests"),
        col("is_primary_key"), col("is_foreign_key"))
      .orderBy(col("name"))
  }

  /** Macros referenced by a model's SQL — containment join over the
    * (small, broadcast) macro relation (O10). */
  def macrosForModel(modelId: String): DataFrame = {
    val sqlText = catalog.models.filter(col("unique_id") === modelId)
      .select(coalesce(when(col("compiled_code") =!= "", col("compiled_code")),
        col("raw_code"), lit("")).as("sql_text"))
    catalog.macros.crossJoin(broadcast(sqlText))
      .filter(col("name") =!= "" && instr(col("sql_text"), col("name")) > 0)
      .select(col("unique_id"), col("name"), col("package_name"), col("description"))
      .orderBy(col("name"))
  }

  /** Direct upstream sources of a model (O11). */
  def sourcesForModel(modelId: String): DataFrame =
    catalog.edges.filter(col("child_id") === modelId)
      .join(catalog.sources, col("parent_id") === catalog.sources("unique_id"))
      .select(catalog.sources("unique_id"), col("name"), col("source_name"),
        col("schema"), col("loader"))
      .orderBy(col("unique_id"))

  /** Test-coverage report for a model (O12). */
  def testCoverage(modelId: String): DataFrame = {
    val cols = catalog.columns.filter(col("model_id") === modelId)
    val tested = catalog.tests
      .filter(col("model_id") === modelId && col("column_name") =!= "")
      .select(col("column_name").as("name")).distinct()
    cols.join(tested.withColumn("is_tested", lit(true)), Seq("name"), "left")
      .select(col("name"), coalesce(col("is_tested"), lit(false)).as("is_tested"),
        col("is_primary_key"))
      .orderBy(col("name"))
  }
}

object HybridSearch {
  val K1 = 1.2
  val B = 0.75

  val stopwords: Set[String] = Set("a", "an", "the", "to", "for", "in", "of",
    "on", "at", "with", "and", "or", "is", "it")

  val stemUdf: UserDefinedFunction = udf((s: String) => Porter.stem(s))

  /** Query tokenizer (search.py:23-35): strip non-word, split, drop
    * stopwords and single chars, stem. */
  def tokenizeQuery(query: String): Seq[String] =
    query.replaceAll("[^A-Za-z0-9\\s]", " ").split("\\s+").toSeq
      .filter(t => t.length > 1 && !stopwords.contains(t.toLowerCase))
      .map(t => Porter.stem(t.toLowerCase))

  /** Intent → layer affinity (search.py:13-20). */
  val intentLayerWeights: Map[String, Map[String, Double]] = Map(
    "debug" -> Map("staging" -> 0.10, "intermediate" -> 0.05),
    "add_feature" -> Map("intermediate" -> 0.05, "marts" -> 0.10),
    "refactor" -> Map("intermediate" -> 0.10, "marts" -> 0.05),
    "test" -> Map("staging" -> 0.05, "intermediate" -> 0.05, "marts" -> 0.05),
    "document" -> Map.empty,
    "explore" -> Map.empty)
}
