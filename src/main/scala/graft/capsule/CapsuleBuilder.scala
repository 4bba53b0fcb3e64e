package graft.capsule

import graft.graph.Lineage
import graft.model._
import graft.patterns.Patterns
import graft.search.HybridSearch
import graft.serve.{ColumnInfo, ModelInfo}
import graft.util.Json

/** Context-capsule assembly — the reference's flagship query
  * (`/root/reference/src/ariadne_dbt/capsule.py:122-501`):
  * intent detection → pivot selection → DAG expansion → three-level
  * skeletonization → greedy token-budgeted fill.
  *
  * Runs entirely on the serving snapshot ([[graft.serve.Snapshot]]):
  * every input relation is bounded catalog metadata and the output is
  * bounded by the token budget itself, so the whole assembly is driver
  * compute — the reference's warm-SQLite profile (P95 < 500 ms),
  * without the dozens of per-capsule job-scheduling round-trips the
  * distributed formulation pays. The distributed operators behind the
  * same semantics (BFS, search, pattern mining) remain first-class in
  * [[graft.graph.Bfs]] / [[graft.patterns.Patterns]] and are
  * gate-checked on unbounded inputs.
  *
  * Greedy-fill edge semantics are preserved exactly (capsule.py:334-396):
  * pivot and test/macro loops SKIP items that overflow (a later smaller
  * item may still be admitted); upstream/downstream loops BREAK at the
  * first overflow (nothing after it is admitted, even if it would fit).
  */
class CapsuleBuilder(catalog: Catalog, search: HybridSearch,
    lineage: Lineage, patterns: Patterns,
    config: graft.config.CapsuleConfig = graft.config.CapsuleConfig()) {

  import CapsuleBuilder._

  // ── Config (config.py:21-41), TOML-overridable (S10) ────────────────
  val maxPivots: Int = config.maxPivots
  val defaultTokenBudget: Int = config.defaultTokenBudget
  val intentDepths: Map[String, (Int, Int)] = config.intentDepths

  private def snap = catalog.snapshot

  // ── Pivot selection (capsule.py:209-270) ────────────────────────────

  private def lookupId(nameOrId: String): Option[String] =
    snap.idByNameLower.get(nameOrId.toLowerCase)
      .orElse(if (snap.modelById.contains(nameOrId)) Some(nameOrId) else None)

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
      search.resolvePathIds(entryPaths).foreach { uid => add(uid); explicit = true }
    }

    var bm25Scores = Seq.empty[Double]
    if (pivots.size < maxP) {
      val fill = search.searchHits(task, intent, limit = maxP - pivots.size + 2,
        excludeIds = pivots.toSeq)
      bm25Scores = fill.map(_.bm25Score)
      fill.foreach(h => add(h.uniqueId))
    }

    val (confidence, refinements) = computeConfidence(explicit, bm25Scores)
    (pivots.toSeq, confidence, refinements)
  }

  // ── Build (capsule.py:136-205) ──────────────────────────────────────

  def build(task: String, focusModel: Option[String] = None,
      entryModels: Seq[String] = Nil, entryPaths: Seq[String] = Nil,
      tokenBudget: Option[Int] = None): ContextCapsule = {
    val budget = tokenBudget.getOrElse(defaultTokenBudget)
    val intent = detectIntent(task)
    val (du, dd) = intentDepths.getOrElse(intent, (1, 1))

    val (pivotIds, confidence, refinements) =
      selectPivots(task, intent, focusModel, entryModels, entryPaths)

    // DAG expansion: one BFS per direction seeded with ALL pivots —
    // equivalent to per-pivot traversal + min-distance merge.
    val pivotSet = pivotIds.toSet
    def expand(up: Boolean, depth: Int): Seq[(String, Int)] =
      if (pivotIds.isEmpty || depth <= 0) Nil
      else snap.bfs(pivotIds, depth, up)
        .filter { case (id, _) => id.startsWith("model.") && !pivotSet(id) }
        .sortBy { case (id, d) => (d, id) }
    val upstreamIds = expand(up = true, du)
    val downstreamIds = expand(up = false, dd)

    // Related context — snapshot lookups in pivot order (dedup-keeps-
    // first parity with the reference's per-pivot loop).
    val testRows = collectTests(pivotIds)
    val macroRows = search.macroRowsForModels(pivotIds).map { case (_, m) =>
      Map("unique_id" -> m.uniqueId, "name" -> m.name,
        "package_name" -> m.packageName, "description" -> m.description)
    }
    val sourceRows = search.sourceRowsForModels(pivotIds).map { case (_, src) =>
      Map("unique_id" -> src.uniqueId, "name" -> src.name,
        "source_name" -> src.sourceName)
    }

    val known = (pivotIds ++ upstreamIds.map(_._1) ++ downstreamIds.map(_._1)).distinct
    val similar = search.searchHits(task, intent, limit = 5, excludeIds = known)
      .map(_.name)

    val patternsMap = patternsDict()

    // ── Assembly with budgeting (capsule.py:308-428) ──────────────────
    val alloc = Map(
      "pivot" -> (budget * 0.45).toInt, "upstream" -> (budget * 0.20).toInt,
      "downstream" -> (budget * 0.10).toInt, "tests_macros" -> (budget * 0.10).toInt)

    // Pivots: full context, SKIP on overflow.
    val pivotCtxs = pivotIds.flatMap { pid =>
      snap.modelById.get(pid).map(m =>
        buildFull(m, cols(pid), testRows.filter(_("model_id") == pid)))
    }
    val (pivotModels, pivotTokens) =
      fillSkip(pivotCtxs, (c: FullModelContext) => Json.estimateTokens(c), alloc("pivot"))

    // Upstream: skeleton, BREAK on first overflow.
    val upCtxs = upstreamIds.sortBy(_._2).flatMap { case (uid, _) =>
      snap.modelById.get(uid).map(m => buildSkeleton(m, cols(uid)))
    }
    val (upstreamModels, upTokens) =
      fillBreak(upCtxs, (c: SkeletonModelContext) => Json.estimateTokens(c), alloc("upstream"))

    // Downstream: minimal, BREAK on first overflow.
    val downCtxs = downstreamIds.sortBy(_._2).flatMap { case (uid, _) =>
      snap.modelById.get(uid).map(m => buildMinimal(m, cols(uid)))
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
    val cap = math.min(math.max(1, limit), 80)
    val intent = detectIntent(task)
    val (pivotIds, _, _) = selectPivots(task, intent, focusModel, entryModels,
      entryPaths, maxP = math.max(maxPivots, 5))

    val out = scala.collection.mutable.LinkedHashMap.empty[String, DiscoverEntry]
    def add(uid: String, rel: String, dist: Int): Unit =
      if (out.size < cap && !out.contains(uid)) snap.modelById.get(uid).foreach { m =>
        out(uid) = DiscoverEntry(uid, m.name, m.layerOrOther,
          Option(m.filePath).getOrElse(""), rel, dist)
      }

    pivotIds.foreach(add(_, "pivot", 0))
    if (pivotIds.nonEmpty) {
      def reach(up: Boolean) = snap.bfs(pivotIds, 4, up)
        .filter(_._1.startsWith("model."))
        .sortBy { case (id, d) => (d, id) }
      reach(up = true).foreach { case (id, d) => add(id, "upstream", d) }
      reach(up = false).foreach { case (id, d) => add(id, "downstream", d) }
    }
    if (out.size < cap)
      search.searchHits(task, intent, limit = cap - out.size + 5,
        excludeIds = out.keys.toSeq)
        .foreach(h => add(h.uniqueId, "search", -1))

    out.values.toSeq
  }

  // ── Snapshot-side helpers ───────────────────────────────────────────

  private def cols(modelId: String): Seq[ColumnInfo] =
    snap.columnsByModel.getOrElse(modelId, Vector.empty)

  private def collectTests(pivotIds: Seq[String]): Seq[Map[String, String]] =
    pivotIds.flatMap(pid => snap.testsByModel.getOrElse(pid, Vector.empty))
      .sortBy(_.uniqueId)
      .map(t => Map(
        "model_id" -> t.modelId,
        "name" -> t.name,
        "test_type" -> t.testType,
        "column_name" -> t.columnName,
        "severity" -> t.severity))

  private def buildFull(m: ModelInfo, cols: Seq[ColumnInfo],
      tests: Seq[Map[String, String]]): FullModelContext = {
    val testsByCol = tests.filter(_("column_name").nonEmpty)
      .groupBy(_("column_name")).map { case (k, v) => k -> v.map(_("test_type")) }
    FullModelContext(
      m.uniqueId, m.name, m.layerOrOther, m.materialization, m.filePath,
      m.sqlText, m.description,
      cols.map(c => SkeletonColumn(c.name, c.dataType, c.description,
        testsByCol.getOrElse(c.name, Nil))),
      m.tags,
      m.dependsOnNodes.filter(_.startsWith("model.")).map(_.split("\\.").last))
  }

  private def buildSkeleton(m: ModelInfo, cols: Seq[ColumnInfo]): SkeletonModelContext =
    SkeletonModelContext(m.uniqueId, m.name, m.layerOrOther, m.materialization,
      cols.map(c => (c.name, c.dataType)))

  private def buildMinimal(m: ModelInfo, cols: Seq[ColumnInfo]): MinimalModelContext =
    MinimalModelContext(m.uniqueId, m.name, m.layerOrOther, cols.size.toLong,
      cols.filter(c => c.isPrimaryKey || c.isForeignKey).map(_.name).take(5))

  /** Project patterns for the capsule — same semantics as
    * [[Patterns.naming]] / [[Patterns.materializationByLayer]], computed
    * on the snapshot. */
  private def patternsDict(): Map[String, String] = {
    val staging = snap.models.filter(_.layer == "staging")
    val stagingExample = staging.map(_.name).sorted.headOption.getOrElse("")
    val doubleUnderscore = staging.exists(_.name.contains("__"))
    val mats = snap.models
      .groupBy(m => (m.layer, m.materialization))
      .map { case ((l, mat), ms) => (l, mat, ms.size) }.toSeq
      .groupBy(_._1)
      .map { case (l, rows) =>
        val (_, mat, _) = rows.minBy { case (_, mat, n) => (-n, Option(mat).getOrElse("")) }
        (l, mat)
      }.toSeq
      .sortBy { case (l, _) => Option(l).getOrElse("") }
      .map { case (l, mat) => s"$l:$mat" }
      .mkString(",")
    Map(
      "staging_example" -> stagingExample,
      "uses_double_underscore" -> doubleUnderscore.toString,
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
