package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.util.Scratch

/** Persisted IVF index — the ANN counterpart of
  * [[graft.search.PostingsIndex]]: an index is BUILT ONCE per corpus
  * (k-means training + corpus assignment) and probed many times, so no
  * per-query work may depend on corpus size beyond the probed buckets.
  *
  * Build: spherical k-means (Lloyd) from a deterministic seed set with
  * integer-quantized component sums (order-independent, so the DuckDB
  * oracle replays training exactly — see `Ann.kmeansIterCte`), then the
  * corpus is assigned to its nearest centroid and written as a
  * bucketed-by-cid, sorted-by-cid table (repartitioned by cid first so
  * each bucket is exactly one file). Bucketing is the 100 TB lever: a
  * probe that filters `cid IN (probed…)` bucket-PRUNES the scan —
  * `SelectedBucketsCount` in the plan — so a probe reads only the
  * probed buckets off disk, never the rest of the corpus
  * (plan-asserted by PlanSpec).
  *
  * The table ALSO persists the int8 scalar-quantized code column `c`
  * (`floor(v_i·127 + 0.5)` as `array<tinyint>` — 8× smaller than the
  * float64 vector column), derived ONCE at build/append/retrain inside
  * the same bucketed write (r12 VERDICT #2: the SQ8 serving shape kept
  * re-deriving codes from the float column per call, defeating the
  * point of the 8×-smaller store). `ann_sq8`/`ann_ivf_sq8` stage 1
  * column-prunes to (vec_id, [cid,] c) and never touches `v`
  * (plan-pinned by Sq8Spec); compaction carries the stored codes
  * byte-for-byte. floor() is exact, so stored codes ≡ recomputed ones
  * and the DuckDB oracle keeps recomputing them.
  *
  * The trained centroid table is tiny (numCentroids rows) and kept as a
  * localCheckpoint for broadcast into probe selection.
  *
  * Lifecycle (drop/branch/snapshot/compact, stale-handle fail-fast,
  * auto-compact cadence) is the shared [[PersistedIndex]] contract;
  * [[Index.retrain]] and the fit-check cadence are IVF-specific
  * (centroids are per-generation state no other index carries).
  */
object IvfIndex {

  final class Index private[IvfIndex] (
      private[graft] val spark: SparkSession,
      private[graft] val baseName: String,
      private[graft] val generation: Int,
      private[graft] val cacheKey: String,
      val centroids: DataFrame,
      numCentroids: Int, trainIters: Int, trainQuant: Double,
      /** PQ codebooks when the index was built with `pq = true` —
        * PLAIN books (sub, cid, cv) trained on the vectors and
        * RESIDUAL books trained on v − centroid(v) (the r13 fixed-pool
        * recall answer: residual magnitudes are a fraction of vector
        * magnitudes, so the same 16×4-bit budget codes them much more
        * finely). Generation state exactly like [[centroids]]: frozen
        * across appends (deltas are coded under the trained books),
        * carried by branches/snapshots/compaction, replaced only by
        * [[retrain]]. The corpus-shared ANN index enables this;
        * per-invocation `fresh()` pipelines default off so their
        * priced closures don't pay an unused training pass. */
      private[graft] val pqBooks: Option[IvfIndex.Books] = None,
      private[graft] val parentIndex: Option[Index] = None)
    extends PersistedIndex[Index] {

    private[graft] def kindName = "IvfIndex"
    private[graft] def logTag = "ivf"
    private[graft] def scratchPrefix = "graft_ivf"
    private[graft] def tableSpecs =
      Seq(PersistedIndex.TableSpec("", "cid", numCentroids))
    private[graft] def cacheGet(key: String): Index = IvfIndex.cache.get(key)
    private[graft] def cachePut(key: String, v: Index): Unit =
      IvfIndex.cache.put(key, v)
    private[graft] def cacheRemoveEntry(key: String, v: Index): Unit =
      IvfIndex.cache.remove(key, v)
    private[graft] def freshSeqNext(): Int = IvfIndex.freshSeq.incrementAndGet()
    /** Branches SHARE the base's frozen centroids (the generation's
      * drift bound); compact/snapshot carry them unchanged — only
      * [[retrain]] replaces them, and it rotates the generation. */
    private[graft] def make(baseName: String, generation: Int, cacheKey: String,
        parent: Option[Index]): Index =
      new Index(spark, baseName, generation, cacheKey,
        centroids, numCentroids, trainIters, trainQuant, pqBooks, parent)

    /** (vec_id, v, cid, c), bucketed by cid; for a [[branch]], the base's
      * table UNIONed with the branch's delta rows (the branch's own
      * table materializes lazily on first append — both sides stay
      * bucketed, so a cid probe bucket-prunes each side). */
    def assigned: DataFrame = {
      assertCurrent()
      withParentView(tableName, _.assigned)
    }

    /** Incrementally index `e2` (normalized (vec_id, v) rows with NEW
      * vec_ids — ENFORCED: the guard semi-joins the delta's ids
      * against the assigned table's id column and throws on overlap;
      * the assigned table holds one row per vector, so the check is a
      * single-column pruned scan of the id inventory, never the
      * vectors) under FROZEN centroids: the delta is assigned to its
      * nearest existing centroid and appended into the bucketed table
      * — cost scales with the delta, never the corpus. Centroids are
      * deliberately not retrained (retraining is a rebuild decision a
      * production pipeline takes offline when drift warrants it); the
      * appended table is bit-identical to assigning old∪new under the
      * same centroids (IvfAppendSpec). Returns this index — probes see
      * the appended buckets immediately, and stats (centroids) are
      * append-invariant so no cache refresh is needed. */
    def append(e2: DataFrame, assumeDisjoint: Boolean = false): Index = {
      assertCurrent()
      // ONE delta materialization for guard + write (the Digest/
      // Minhash/Embed round-12 fusion): the former bare-ids checkpoint
      // evaluated the delta once for the guard and assign() scanned it
      // AGAIN for the write; assigning before the guard wastes only
      // the centroid argmax when the guard trips — the
      // contract-violation path, not the hot path. assumeDisjoint:
      // caller-proven id disjointness skips the guard AND the
      // checkpoint (single consumer left — the write streams the
      // assignment directly; the [[DigestIndex.Index.appendDerived]]
      // guard-cost note).
      val assignedDelta0 = withCodes(assign(e2, centroids)
        .select(col("vec_id"), col("v"), col("cid")), pqBooks, centroids)
      val assignedDelta =
        if (assumeDisjoint) assignedDelta0
        else {
          val a = assignedDelta0.localCheckpoint()
          val clashes = assigned.select(col("vec_id"))
            .join(broadcast(a.select(col("vec_id"))), "vec_id").limit(1).count()
          require(clashes == 0,
            s"append violates the disjointness contract: delta contains vec_ids already in $tableName")
          a
        }
      writeBucketed(assignedDelta, tableName, "cid", numCentroids, "append")
      // [scale] compact_every_appends cadence — base tables only.
      // [scale] ivf_fit_check_every + ivf_retrain_below_cos cadence:
      // every N appends the base index pays the fitStats gauge (a
      // corpus-sized single-column read — deliberately NOT on every
      // delta-sized append, hence its own cadence) and rotates the
      // generation via retrain() when the frozen centroids' mean
      // assigned cosine has drifted below the threshold. The caller's
      // "use the returned instance" contract carries the fresh
      // generation back, exactly as auto-compact does. Branches never
      // auto-compact or auto-retrain.
      // Both cadences keyed by the generation-stable baseName (r11
      // ADVICE: a tableName key restarts on every rotation, so with
      // compact_every_appends <= ivf_fit_check_every the fit counter
      // would be wiped before it ever fired).
      if (parentIndex.nonEmpty) this
      else {
        val cur = if (IndexMaintenance.appendTick(baseName)) compact() else this
        val below = IndexMaintenance.ivfRetrainBelowCos
        if (below > 0.0 && IndexMaintenance.fitTick(baseName) &&
            cur.fitStats.collect().head.getDouble(1) < below)
          cur.retrain()
        else cur
      }
    }

    /** RETRAIN the generation — the operation [[append]]'s frozen-
      * centroid contract defers to: re-run the deterministic Lloyd
      * loop with the CURRENT indexed vectors (seed rule unchanged:
      * vec_id < numCentroids among them), reassign every vector to the
      * new centroids, and rotate the generation. Because the seed rule
      * and iteration count are those of a fresh build, retrain after
      * any sequence of frozen appends lands EXACTLY on the fresh-build
      * state for the union corpus (IvfRetrainSpec pins table and
      * centroid equality; the `ann_ivf_retrain` gate replays it in
      * DuckDB as full-corpus k-means). Cost = a fresh build over the
      * indexed vectors read back from the bucketed table (train passes
      * scan it in place — nothing is collected or checkpointed), which
      * is the point: retraining is the priced, explicit alternative to
      * the free-but-drifting [[append]] path, and [[fitStats]] is the
      * gauge that says when to pay it. Prior-generation handles (and
      * branches of them) fail fast afterwards. */
    def retrain(iters: Int = trainIters, quantScale: Double = trainQuant): Index = {
      assertCurrent()
      require(parentIndex.isEmpty,
        "retrain() on a branch is unsupported: the branch's table holds only its " +
          "delta and its centroids are the base's — retrain the base index")
      graft.util.BuildLog.timed(s"ivf-retrain:$baseName") {
        val e = assigned.select(col("vec_id"), col("v"))
        val cent = IvfIndex.train(e, numCentroids, iters, quantScale)
        // Checkpoint the reassignment only when PQ retrains too (the
        // residual training pass re-reads it; a plain retrain uses it
        // once, in the write).
        val reassigned0 = assign(e, cent).select(col("vec_id"), col("v"), col("cid"))
        val reassigned =
          if (pqBooks.isDefined) reassigned0.localCheckpoint() else reassigned0
        // PQ codebooks are generation state like the centroids: a
        // pq-enabled index retrains them (the SAME sets it was built
        // with) over the same union corpus (seed rule unchanged), so
        // retrain ≡ fresh-build holds for the stored code columns too.
        val books = pqBooks.flatMap(b =>
          trainBooks(reassigned, cent, b.residual.isDefined, b.wide.isDefined,
            b.opq.isDefined))
        val next = s"${baseName}_g${generation + 1}"
        spark.sql(s"DROP TABLE IF EXISTS $next")
        writeBucketed(withCodes(reassigned, books, cent),
          next, "cid", numCentroids, "overwrite")
        spark.sql(s"DROP TABLE IF EXISTS $tableName")
        Scratch.delete(tableName)
        // Fresh centroids restart the drift clock; the rewrite is also
        // one file per bucket, so the compaction count restarts too.
        IndexMaintenance.resetFit(baseName)
        IndexMaintenance.resetAppend(baseName)
        val retrained = new Index(spark, baseName, generation + 1, cacheKey,
          cent, numCentroids, iters, quantScale, books)
        cache.put(cacheKey, retrained)
        retrained
      }
    }

    /** One-row drift gauge for the retrain decision: how well this
      * generation's centroids still fit the indexed vectors. Columns:
      * `n` (indexed vectors), `mean_cos`/`min_cos` (assigned cosine —
      * falls as frozen-centroid appends drift from the trained
      * distribution), `max_bucket_frac` (largest bucket's share — a
      * drifting corpus piles into few buckets, which is what erodes
      * probe pruning). One pass over the assigned table with map-side
      * partial aggregation; the shuffle carries ≤ numCentroids rows.
      * The mean is integer-quantized before summing (the [[build]]
      * k-means idiom, 1e9 scale): a gauge that returns bit-identical
      * values regardless of aggregation order is both reproducible
      * across runs AND DuckDB-replayable — the `ann_ivf_fitstats`
      * gate pins it; min/max-fraction are exact without quantization. */
    def fitStats: DataFrame = {
      assertCurrent()
      graft.functions.DotProduct.register(spark)
      val per = assigned.join(broadcast(centroids), "cid")
        .select(col("cid"), expr("graft_dot(v, cv)").as("ccos"))
        .groupBy(col("cid"))
        .agg(count(lit(1)).as("cn"),
          sum(floor(col("ccos") * lit(1e9) + 0.5).cast("long")).as("sq"),
          min(col("ccos")).as("mn"))
      per.agg(sum(col("cn")).cast("long").as("n"),
        (sum(col("sq")).cast("double") / sum(col("cn")).cast("double") / 1e9)
          .as("mean_cos"),
        min(col("mn")).as("min_cos"),
        (max(col("cn")).cast("double") / sum(col("cn")).cast("double"))
          .as("max_bucket_frac"))
    }
  }

  /** Per-vector argmax as max_by under groupBy (NOT a row_number
    * window): partial aggregation combines map-side, so the shuffle
    * moves n rows instead of n×centroids. Tie-break (ccos desc, cid
    * asc) via the (ccos, -cid) key struct matches the oracle's
    * ROW_NUMBER ordering. */
  private def assign(e: DataFrame, toCent: DataFrame): DataFrame =
    e.crossJoin(broadcast(toCent))
      .select(col("vec_id"), col("v"), col("cid"), expr("graft_dot(v, cv)").as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        any_value(col("v")).as("v"))

  // One index per (session, corpus): repeated queries — bench rounds,
  // Verify — probe the built table instead of re-training per call.
  // Keyed on sessionUUID (guaranteed unique, unlike identityHashCode
  // which can collide or be reused after GC).
  private val cache = new ConcurrentHashMap[String, Index]()

  private val freshSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Build-or-reuse the IVF index for corpus `corpusKey`. `e` (the
    * normalized (vec_id, v) frame with `graft_dot` registered) is
    * by-name: on a cache hit the normalization pass never runs — the
    * index table already stores the normalized vectors, so repeated
    * queries are probe-only. */
  def of(spark: SparkSession, corpusKey: String, e: => DataFrame,
      numCentroids: Int, iters: Int, quantScale: Double,
      pq: Boolean = false, pqResidual: Boolean = true,
      pqWide: Boolean = true, pqOpq: Boolean = true): Index = {
    // The pq flag — INCLUDING which codebook sets it trains — is PART
    // of the identity (r13 ADVICE: with a plain corpusKey key,
    // whichever caller resolved first won — a later pq=true request
    // against a cached pq-less index would fail at query time).
    // Distinct keys ⇒ distinct tables, so differently-equipped indexes
    // of the same corpus coexist without clobbering. pqResidual/pqWide
    // gate the extra codebook sets (r14 ADVICE: the gate corpus needs
    // all three, but a deployment serving only one geometry shouldn't
    // pay the other Lloyd passes and stored bytes on every append).
    val pqKey =
      if (!pq) corpusKey
      else s"$corpusKey|pq${if (pqResidual) "" else "-nr"}" +
        s"${if (pqWide) "" else "-nw"}${if (pqOpq) "" else "-no"}"
    val key = graft.util.Scratch.sessionId(spark) + "|" + pqKey
    cache.computeIfAbsent(key, _ => graft.util.BuildLog.timed(s"ivf:$pqKey") {
      build(spark, pqKey, e, numCentroids, iters, quantScale, key, pq,
        pqResidual, pqWide, pqOpq)
    })
  }

  /** The deterministic spherical k-means loop shared by [[build]] and
    * [[Index.retrain]]: seeds = vec_id < numCentroids among `e`'s
    * rows, `iters` Lloyd iterations with integer-quantized component
    * sums (order-independent — the oracle replays it), returns the
    * checkpointed (cid, cv) centroid frame. */
  private def train(e: DataFrame, numCentroids: Int, iters: Int,
      quantScale: Double): DataFrame = {
    var cent = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val means = assign(e, cent)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "val")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(floor(col("val") * quantScale + 0.5)).as("sq"),
          count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"),
            (col("sq").cast("double") / col("n").cast("double") / quantScale)
              .as("comp")))),
          x => x.getField("comp")).as("cv0"))
      cent = means
        .withColumn("nrm", sqrt(VectorOps.norm2(col("cv0"))))
        .select(col("cid"), transform(col("cv0"), x => x / col("nrm")).as("cv"))
    }
    cent.localCheckpoint()
  }

  /** Build an UNcached, caller-owned index (the [[MinhashIndex]]
    * `fresh` contract: per-invocation mutation — append, retrain —
    * must never leak into the shared of() instances; call
    * [[Index.drop]] when done). */
  def fresh(spark: SparkSession, corpusKey: String, e: DataFrame,
      numCentroids: Int, iters: Int, quantScale: Double,
      pq: Boolean = false, pqResidual: Boolean = true,
      pqWide: Boolean = true, pqOpq: Boolean = true): Index =
    graft.util.BuildLog.timed(s"ivf-fresh:$corpusKey") {
      val k = s"$corpusKey#${freshSeq.incrementAndGet()}"
      build(spark, k, e, numCentroids, iters, quantScale,
        Scratch.sessionId(spark) + "|" + k, pq, pqResidual, pqWide, pqOpq)
    }

  private def build(spark: SparkSession, corpusKey: String, e: DataFrame,
      numCentroids: Int, iters: Int, quantScale: Double,
      cacheKey: String, pq: Boolean = false, pqResidual: Boolean = true,
      pqWide: Boolean = true, pqOpq: Boolean = true): Index = {
    val cent = train(e, numCentroids, iters, quantScale)
    val assigned0 = assign(e, cent).select(col("vec_id"), col("v"), col("cid"))
    val assignedF = if (pq) assigned0.localCheckpoint() else assigned0
    val books =
      if (pq) trainBooks(assignedF, cent, pqResidual, pqWide, pqOpq) else None

    // Session-scoped table name + scratch path (two sessions building
    // the same corpus never clobber each other — ADVICE r5).
    val tableName = Scratch.tableName(spark, "graft_ivf", corpusKey)
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    val idx = new Index(spark, tableName, 0, cacheKey,
      cent, numCentroids, iters, quantScale, books)
    // One shuffle by cid so each bucket lands as a single file — the
    // writeBucketed idiom (see PersistedIndex).
    idx.writeBucketed(withCodes(assignedF, books, cent),
      tableName, "cid", numCentroids, "overwrite")
    idx
  }

  /** PQ codebooks of an index: plain books over the vectors AND
    * residual books over v − centroid(cid). GRACEFUL on a degenerate
    * corpus (r13 ADVICE: the dense-codebook require aborted the SHARED
    * index build, failing every ANN gate when only the PQ gates need
    * books): an empty Lloyd cell downgrades to `None` with a warning —
    * the index builds and serves IVF/SQ8 normally, and only a PQ query
    * hits [[AnnPq]]'s actionable error. */
  private def trainBooks(assignedF: DataFrame, cent: DataFrame,
      residualSet: Boolean = true, wideSet: Boolean = true,
      opqSet: Boolean = true): Option[Books] =
    try {
      val vecs = assignedF.select(col("vec_id"), col("v"))
      val plain = PqCodec.train(vecs)
      val residual =
        if (!residualSet) None
        else Some(PqCodec.train(
          assignedF.select(col("vec_id"),
            PqCodec.residualCol(col("v"), col("cid"), collectCentroids(cent))
              .as("v"))))
      val wide = if (wideSet) Some(PqCodec.train(vecs, PqCodec.G8)) else None
      val opq =
        if (!opqSet) None
        else {
          val perm = PqCodec.energyPermutation(vecs).toSeq
          Some(OpqSet(PqCodec.train(
            vecs.select(col("vec_id"),
              PqCodec.permuteCol(col("v"), perm).as("v"))), perm))
        }
      Some(Books(plain, residual, wide, opq))
    } catch {
      case e: IllegalArgumentException =>
        System.err.println(s"[ivf] PQ codebook training degraded to pq-less " +
          s"index (only ann_pq-family queries fail): ${e.getMessage}")
        None
    }

  /** The three PQ codebook sets — G16 PLAIN, G16 RESIDUAL (over
    * v − centroid(cid)), G8 WIDE (the same-budget recall rung) — one
    * value so they can never desync across branch/snapshot/retrain
    * plumbing. */
  /** The OPQ-lite set: G16 books trained over the PERMUTED vectors +
    * the energy-balancing permutation itself (needed at query time to
    * rotate the query before the ADC LUT). */
  final case class OpqSet(books: DataFrame, perm: Seq[Int])

  /** The trained PQ codebook sets — G16 plain always; G16 residual,
    * G8 wide, and the G16 OPQ-permutation set only when the build
    * asked for them (r14 ADVICE: the extra Lloyd passes and stored
    * columns are config-gated for deployments serving one geometry;
    * the gate corpus trains all four). */
  final case class Books(plain: DataFrame, residual: Option[DataFrame],
      wide: Option[DataFrame], opq: Option[OpqSet])

  /** Centroids as a dense cid-indexed matrix for the literal residual
    * transform (cids are dense 0..n-1 by the seed rule vec_id <
    * numCentroids, preserved by retrain). */
  private[graft] def collectCentroids(cent: DataFrame): Array[Array[Double]] = {
    val rows = cent.select(col("cid"), col("cv")).collect()
    require(rows.nonEmpty, "no centroids")
    val out = new Array[Array[Double]](rows.map(_.getLong(0).toInt).max + 1)
    rows.foreach(r => out(r.getLong(0).toInt) = r.getSeq[Double](1).toArray)
    out.zipWithIndex.foreach { case (v, i) =>
      require(v != null, s"centroid cid=$i missing — the positional residual " +
        "lookup needs dense cids (the full-corpus seed rule gives 0..n-1; a " +
        "cohort-filtered corpus does not and cannot train residual PQ)") }
    out
  }

  /** SQ8 quantization scale: vectors are L2-normalized (components ∈
    * [-1, 1]), so one GLOBAL scale keeps integer code dots comparable
    * across vectors; 127 saturates int8. Shared with the query-side
    * code derivation in [[Ann]]. */
  private[graft] val Sq8Scale = 127.0

  /** Append the persisted code columns to assigned rows — the ONE
    * transform every write path (build / append / retrain) runs, so
    * the quantized stores exist the moment the vector lands and are
    * never re-derived at query time. floor(v·127 + 0.5) ∈
    * [-127, 127] is exact in a double and exact again as tinyint, so
    * the stored codes are bit-identical to a recomputation (the DuckDB
    * oracle recomputes; compaction carries the stored bytes).
    *
    * PQ columns when the index carries codebooks — all three via the
    * [[PqEncode]] codegen kernel (books ride as reference objects;
    * no join, no extra job, so appends stay delta-sized): `pc` = the
    * packed G16 plain word (one BIGINT, 8 stored bytes; the r13
    * array<tinyint> form paid parquet array framing on 16 elements),
    * `prc` = the packed G16 RESIDUAL word over v − centroid(cid),
    * `pw` = the packed G8 WIDE word. Stored ≡ recomputed
    * (deterministic training + exact literal round trip), so the
    * oracle keeps recomputing. */
  private def withCodes(df: DataFrame, pqBooks: Option[Books],
      cent: DataFrame): DataFrame = {
    val sq8 = df.withColumn("c",
      org.apache.spark.sql.functions.transform(col("v"),
        x => floor(x * Sq8Scale + 0.5).cast("tinyint")))
    pqBooks.fold(sq8) { books =>
      // The residual is BOUND to a real column before encoding (the
      // kernel reads each element; an earlier literal-argmin form
      // inlined the zip_with-over-1024-literal-centroids expression
      // 1024× and serialized 65-72 MiB task binaries per write stage).
      // Residual/wide columns exist only when their books do — a
      // geometry the build skipped costs no encode pass and no bytes.
      val withPc = sq8.withColumn("pc",
        PqCodec.encode(col("v"), PqCodec.collectBooks(books.plain)))
      val withPw = books.wide.fold(withPc)(w => withPc.withColumn("pw",
        PqCodec.encode(col("v"),
          PqCodec.collectBooks(w, PqCodec.G8), PqCodec.G8)))
      val withPrc = books.residual.fold(withPw)(r => withPw
        .withColumn("rv", PqCodec.residualCol(col("v"), col("cid"),
          collectCentroids(cent)))
        .withColumn("prc", PqCodec.encode(col("rv"), PqCodec.collectBooks(r)))
        .drop("rv"))
      books.opq.fold(withPrc)(o => withPrc
        .withColumn("ov", PqCodec.permuteCol(col("v"), o.perm))
        .withColumn("poc", PqCodec.encode(col("ov"), PqCodec.collectBooks(o.books)))
        .drop("ov"))
    }
  }
}
