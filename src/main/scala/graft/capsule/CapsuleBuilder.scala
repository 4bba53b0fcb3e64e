package graft.capsule

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.graph.{Bfs, Lineage}
import graft.model._
import graft.patterns.Patterns
import graft.search.HybridSearch
import graft.util.Json

/** Context-capsule assembly — the reference's flagship query
  * (`/root/reference/src/ariadne_dbt/capsule.py:122-501`):
  * intent detection → pivot selection → DAG expansion → three-level
  * skeletonization → greedy token-budgeted fill.
  *
  * Execution split mirrors SURVEY.md §4.3: every scan/join/traversal is
  * a Spark job (search, BFS seeded with the whole pivot set at once —
  * which IS the reference's per-pivot min-distance merge), while the
  * final assembly runs driver-side on collections that are bounded by
  * the token budget itself.
  *
  * Greedy-fill edge semantics are preserved exactly (capsule.py:334-396):
  * pivot and test/macro loops SKIP items that overflow (a later smaller
  * item may still be admitted); upstream/downstream loops BREAK at the
  * first overflow (nothing after it is admitted, even if it would fit).
  */
class CapsuleBuilder(catalog: Catalog, search: HybridSearch,
    lineage: Lineage, patterns: Patterns) {

  import CapsuleBuilder._

  // ── Config (config.py:21-41) ────────────────────────────────────────
  val maxPivots = 3
  val defaultTokenBudget = 10000
  val intentDepths: Map[String, (Int, Int)] = Map(
    "debug" -> (2, 1), "add_feature" -> (1, 2), "refactor" -> (1, 3),
    "test" -> (0, 0), "document" -> (1, 1), "explore" -> (1, 1))

  private def spark = catalog.models.sparkSession

  // ── Pivot selection (capsule.py:209-270) ────────────────────────────

  private def lookupId(nameOrId: String): Option[String] = {
    val hit = search.lookup(nameOrId).select("unique_id").collect()
    hit.headOption.map(_.getString(0))
  }

  /** Returns (pivotIds, confidence, refinements). */
  def selectPivots(task: String, intent: String, focusModel: Option[String],
      entryModels: Seq[String], entryPaths: Seq[String],
      maxP: Int = maxPivots): (Seq[String], String, Seq[String]) = {
    val pivots = scala.collection.mutable.LinkedHashSet.empty[String]
    var explicit = false
    def add(uid: String): Unit = if (pivots.size < maxP) pivots += uid

    focusModel.flatMap(lookupId).foreach { uid => add(uid); explicit = true }
    entryModels.flatMap(lookupId).foreach { uid => add(uid); explicit = true }
    if (entryPaths.nonEmpty) {
      search.resolvePaths(entryPaths).collect().map(_.getString(0))
        .foreach { uid => add(uid); explicit = true }
    }

    var bm25Scores = Seq.empty[Double]
    if (pivots.size < maxP) {
      val fill = search.search(task, intent, limit = maxP - pivots.size + 2,
        excludeIds = pivots.toSeq).collect()
      bm25Scores = fill.map(r => r.getAs[Double]("bm25_score")).toSeq
      fill.foreach(r => add(r.getAs[String]("unique_id")))
    }

    val (confidence, refinements) = computeConfidence(explicit, bm25Scores)
    (pivots.toSeq, confidence, refinements)
  }

  // ── Build (capsule.py:136-205) ──────────────────────────────────────

  def build(task: String, focusModel: Option[String] = None,
      entryModels: Seq[String] = Nil, entryPaths: Seq[String] = Nil,
      tokenBudget: Option[Int] = None): ContextCapsule = {
    val sp = spark
    import sp.implicits._
    val budget = tokenBudget.getOrElse(defaultTokenBudget)
    val intent = detectIntent(task)
    val (du, dd) = intentDepths.getOrElse(intent, (1, 1))

    val (pivotIds, confidence, refinements) =
      selectPivots(task, intent, focusModel, entryModels, entryPaths)

    // DAG expansion: one BFS per direction seeded with ALL pivots —
    // equivalent to per-pivot traversal + min-distance merge.
    def expand(up: Boolean, depth: Int): Seq[(String, Int)] =
      if (pivotIds.isEmpty || depth <= 0) Nil
      else Bfs.traverse(catalog.edges, pivotIds.toDF("id"), depth, up)
        .filter(col("id").startsWith("model.") && !col("id").isin(pivotIds: _*))
        .orderBy(col("distance"), col("id"))
        .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    val upstreamIds = expand(up = true, du)
    val downstreamIds = expand(up = false, dd)

    // Related context — one batched job per relation instead of one
    // per pivot; rows re-sorted to pivot order for dedup-keeps-first
    // parity with the reference's per-pivot loop.
    val pivotIdx = pivotIds.zipWithIndex.toMap
    val testRows = collectTests(pivotIds)
    val macroRows =
      if (pivotIds.isEmpty) Nil
      else search.macrosForModels(pivotIds).collect()
        .sortBy(r => (pivotIdx(r.getAs[String]("model_id")), r.getAs[String]("name")))
        .map(r => Map("unique_id" -> r.getAs[String]("unique_id"),
          "name" -> r.getAs[String]("name"),
          "package_name" -> r.getAs[String]("package_name"),
          "description" -> r.getAs[String]("description"))).toSeq
    val sourceRows =
      if (pivotIds.isEmpty) Nil
      else search.sourcesForModels(pivotIds).collect()
        .sortBy(r => (pivotIdx(r.getAs[String]("model_id")), r.getAs[String]("unique_id")))
        .map(r => Map("unique_id" -> r.getAs[String]("unique_id"),
          "name" -> r.getAs[String]("name"),
          "source_name" -> r.getAs[String]("source_name"))).toSeq

    val known = (pivotIds ++ upstreamIds.map(_._1) ++ downstreamIds.map(_._1)).distinct
    val similar = search.search(task, intent, limit = 5, excludeIds = known)
      .select("name").collect().map(_.getString(0)).toSeq

    val patternsMap = patternsDict()

    // ── Assembly with budgeting (capsule.py:308-428) ──────────────────
    val alloc = Map(
      "pivot" -> (budget * 0.45).toInt, "upstream" -> (budget * 0.20).toInt,
      "downstream" -> (budget * 0.10).toInt, "tests_macros" -> (budget * 0.10).toInt)

    val modelRows = collectModels(known)
    val columnRows = collectColumns(known)

    // Pivots: full context, SKIP on overflow.
    val pivotCtxs = pivotIds.flatMap { pid =>
      modelRows.get(pid).map(m =>
        buildFull(m, columnRows.getOrElse(pid, Nil), testRows.filter(_("model_id") == pid)))
    }
    val (pivotModels, pivotTokens) =
      fillSkip(pivotCtxs, (c: FullModelContext) => Json.estimateTokens(c), alloc("pivot"))

    // Upstream: skeleton, BREAK on first overflow.
    val upCtxs = upstreamIds.sortBy(_._2).flatMap { case (uid, _) =>
      modelRows.get(uid).map(m => buildSkeleton(m, columnRows.getOrElse(uid, Nil)))
    }
    val (upstreamModels, upTokens) =
      fillBreak(upCtxs, (c: SkeletonModelContext) => Json.estimateTokens(c), alloc("upstream"))

    // Downstream: minimal, BREAK on first overflow.
    val downCtxs = downstreamIds.sortBy(_._2).flatMap { case (uid, _) =>
      modelRows.get(uid).map(m => buildMinimal(m, columnRows.getOrElse(uid, Nil)))
    }
    val (downstreamModels, downTokens) =
      fillBreak(downCtxs, (c: MinimalModelContext) => Json.estimateTokens(c), alloc("downstream"))

    // Tests then macros share a bucket; tests capped at half; SKIP.
    val (keptTests, testTokens) =
      fillSkip(testRows, (t: Map[String, String]) => Json.estimateTokens(t), alloc("tests_macros") / 2)
    val (keptMacros, tmTokens) =
      fillSkip(macroRows, (m: Map[String, String]) => Json.estimateTokens(m),
        alloc("tests_macros"), startTokens = testTokens)

    val uniqueSources = sourceRows.foldLeft(Vector.empty[Map[String, String]]) {
      (acc, s) => if (acc.exists(_("unique_id") == s("unique_id"))) acc else acc :+ s
    }

    val total = pivotTokens + upTokens + downTokens + tmTokens +
      Json.estimateTokens(patternsMap)

    ContextCapsule(task, intent, pivotModels, upstreamModels,
      downstreamModels, keptTests.map(_.filter(_._1 != "model_id")),
      keptMacros, uniqueSources, patternsMap, similar, confidence,
      refinements, total, budget)
  }

  // ── Discover (capsule.py:432-501) ───────────────────────────────────

  def discover(task: String, focusModel: Option[String] = None,
      entryModels: Seq[String] = Nil, entryPaths: Seq[String] = Nil,
      limit: Int = 40): Seq[DiscoverEntry] = {
    val sp = spark
    import sp.implicits._
    val cap = math.min(math.max(1, limit), 80)
    val intent = detectIntent(task)
    val (pivotIds, _, _) = selectPivots(task, intent, focusModel, entryModels,
      entryPaths, maxP = math.max(maxPivots, 5))

    val rows = collectModels(allIds = Nil, all = true)
    val out = scala.collection.mutable.LinkedHashMap.empty[String, DiscoverEntry]
    def add(uid: String, rel: String, dist: Int): Unit =
      if (out.size < cap && !out.contains(uid)) rows.get(uid).foreach { m =>
        out(uid) = DiscoverEntry(uid, m.getAs[String]("name"),
          Option(m.getAs[String]("layer")).getOrElse("other"),
          Option(m.getAs[String]("file_path")).getOrElse(""), rel, dist)
      }

    pivotIds.foreach(add(_, "pivot", 0))
    if (pivotIds.nonEmpty) {
      def reach(up: Boolean) =
        Bfs.traverse(catalog.edges, pivotIds.toDF("id"), 4, up)
          .filter(col("id").startsWith("model."))
          .orderBy(col("distance"), col("id")).collect()
      reach(up = true).foreach(r => add(r.getString(0), "upstream", r.getInt(1)))
      reach(up = false).foreach(r => add(r.getString(0), "downstream", r.getInt(1)))
    }
    if (out.size < cap)
      search.search(task, intent, limit = cap - out.size + 5, excludeIds = out.keys.toSeq)
        .collect().foreach(r => add(r.getAs[String]("unique_id"), "search", -1))

    out.values.toSeq
  }

  // ── Driver-side helpers ─────────────────────────────────────────────

  private def collectModels(allIds: Seq[String], all: Boolean = false): Map[String, Row] = {
    val df = if (all) catalog.models
      else if (allIds.isEmpty) catalog.models.limit(0)
      else catalog.models.filter(col("unique_id").isin(allIds: _*))
    df.collect().map(r => r.getAs[String]("unique_id") -> r).toMap
  }

  private def collectColumns(ids: Seq[String]): Map[String, Seq[Row]] =
    if (ids.isEmpty) Map.empty
    else catalog.columns.filter(col("model_id").isin(ids: _*))
      .orderBy("model_id", "name").collect()
      .groupBy(_.getAs[String]("model_id")).map { case (k, v) => k -> v.toSeq }

  private def collectTests(pivotIds: Seq[String]): Seq[Map[String, String]] =
    if (pivotIds.isEmpty) Nil
    else catalog.tests.filter(col("model_id").isin(pivotIds: _*))
      .orderBy("unique_id").collect()
      .map(r => Map(
        "model_id" -> r.getAs[String]("model_id"),
        "name" -> r.getAs[String]("name"),
        "test_type" -> r.getAs[String]("test_type"),
        "column_name" -> r.getAs[String]("column_name"),
        "severity" -> r.getAs[String]("severity"))).toSeq

  private def buildFull(m: Row, cols: Seq[Row], tests: Seq[Map[String, String]]): FullModelContext = {
    val testsByCol = tests.filter(_("column_name").nonEmpty)
      .groupBy(_("column_name")).map { case (k, v) => k -> v.map(_("test_type")) }
    FullModelContext(
      m.getAs[String]("unique_id"), m.getAs[String]("name"),
      Option(m.getAs[String]("layer")).getOrElse("other"),
      m.getAs[String]("materialization"), m.getAs[String]("file_path"),
      { val c = m.getAs[String]("compiled_code"); if (c != null && c.nonEmpty) c else m.getAs[String]("raw_code") },
      m.getAs[String]("description"),
      cols.map(c => SkeletonColumn(c.getAs[String]("name"), c.getAs[String]("data_type"),
        c.getAs[String]("description"), testsByCol.getOrElse(c.getAs[String]("name"), Nil))),
      m.getAs[scala.collection.Seq[String]]("tags").toSeq,
      m.getAs[scala.collection.Seq[String]]("depends_on_nodes").toSeq
        .filter(_.startsWith("model.")).map(_.split("\\.").last))
  }

  private def buildSkeleton(m: Row, cols: Seq[Row]): SkeletonModelContext =
    SkeletonModelContext(m.getAs[String]("unique_id"), m.getAs[String]("name"),
      Option(m.getAs[String]("layer")).getOrElse("other"),
      m.getAs[String]("materialization"),
      cols.map(c => (c.getAs[String]("name"), c.getAs[String]("data_type"))))

  private def buildMinimal(m: Row, cols: Seq[Row]): MinimalModelContext =
    MinimalModelContext(m.getAs[String]("unique_id"), m.getAs[String]("name"),
      Option(m.getAs[String]("layer")).getOrElse("other"), cols.size,
      cols.filter(c => c.getAs[Boolean]("is_primary_key") || c.getAs[Boolean]("is_foreign_key"))
        .map(_.getAs[String]("name")).take(5))

  private def patternsDict(): Map[String, String] = {
    val n = patterns.naming().collect().headOption
    val mats = patterns.materializationByLayer().collect()
      .map(r => s"${r.getAs[String]("layer")}:${r.getAs[String]("materialization")}")
      .mkString(",")
    Map(
      "staging_example" -> n.map(r => Option(r.getAs[String]("staging_example")).getOrElse("")).getOrElse(""),
      "uses_double_underscore" -> n.map(_.getAs[Boolean]("uses_double_underscore").toString).getOrElse("false"),
      "common_materializations" -> mats)
  }
}

object CapsuleBuilder {

  /** Greedy budgeted fill, SKIP semantics (capsule.py:337-347,381-396):
    * an overflowing item is passed over but LATER (possibly smaller)
    * items may still be admitted. `startTokens` lets two phases share
    * one bucket (tests then macros). Returns (kept, tokensUsed). */
  def fillSkip[A](items: Seq[A], cost: A => Int, budget: Int,
      startTokens: Int = 0): (Seq[A], Int) = {
    var used = startTokens
    val kept = items.filter { a =>
      val c = cost(a)
      val ok = used + c <= budget
      if (ok) used += c
      ok
    }
    (kept, used)
  }

  /** Greedy budgeted fill, BREAK semantics (capsule.py:352-379): stop
    * at the FIRST overflow — items after it are never admitted even if
    * they would fit. Returns (kept, tokensUsed). */
  def fillBreak[A](items: Seq[A], cost: A => Int, budget: Int): (Seq[A], Int) = {
    var used = 0
    val kept = Seq.newBuilder[A]
    val it = items.iterator
    var stop = false
    while (!stop && it.hasNext) {
      val a = it.next()
      val c = cost(a)
      if (used + c <= budget) { used += c; kept += a } else stop = true
    }
    (kept.result(), used)
  }

  /** Intent keyword tables (capsule.py:24-43); Python dict-order tie
    * break (first inserted wins on equal score) is preserved by the
    * Seq order here. */
  val intentKeywords: Seq[(String, Seq[String])] = Seq(
    "debug" -> Seq("debug", "fix", "error", "fail", "broken", "wrong",
      "incorrect", "issue", "bug", "problem", "test failing"),
    "add_feature" -> Seq("add", "create", "new", "build", "implement",
      "feature", "metric", "measure", "calculate"),
    "refactor" -> Seq("refactor", "restructure", "reorganize", "rename",
      "move", "split", "merge", "optimize", "performance"),
    "test" -> Seq("test", "coverage", "validate", "assert", "check", "verify"),
    "document" -> Seq("document", "describe", "description", "docs",
      "comment", "explain"),
    "explore" -> Seq("explore", "understand", "find", "search", "show",
      "list", "what", "how", "which"))

  def detectIntent(task: String): String = {
    val lower = task.toLowerCase
    val scores = intentKeywords.map { case (intent, kws) =>
      intent -> kws.count(lower.contains)
    }.filter(_._2 > 0)
    if (scores.isEmpty) "explore" else scores.maxBy(_._2)._1
  }

  /** Confidence rules (capsule.py:272-304). */
  def computeConfidence(hasExplicit: Boolean, bm25: Seq[Double]): (String, Seq[String]) = {
    if (hasExplicit) return ("high", Nil)
    if (bm25.size >= 3) {
      val (top, third) = (bm25.head, bm25(2))
      if (third > 0 && top / third > 2.0) return ("high", Nil)
      if (third > 0 && top / third > 1.5) return ("medium", Nil)
    } else if (bm25.nonEmpty && bm25.head > 5.0) return ("medium", Nil)
    ("low", Seq(
      "Try calling with focus_model='model_name' if you know the target model",
      "Try find_models_by_column('column_name') to search by business concept",
      "Try find_models_by_path('models/marts/...') to search by directory"))
  }
}
