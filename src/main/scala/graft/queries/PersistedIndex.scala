package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.util.Scratch

/** The lifecycle shared by the five persisted bucketed indexes
  * ([[graft.search.PostingsIndex]] / [[IvfIndex]] / [[MinhashIndex]] /
  * [[DigestIndex]] / [[EmbedIndex]]), hoisted so a lifecycle fix is
  * single-site (SURVEY §9.10 — the round-11 cache-release fix and the
  * round-12 cadence/guard fixes each had to land in five places):
  *
  *   - generation naming (`<base>_gN` after N compactions/retrains);
  *   - stale-handle fail-fast after a generation rotation
  *     ([[assertCurrent]] — r7 ADVICE: a handle whose generation was
  *     compacted away must throw the actionable message, not a bare
  *     missing-table error; a branch also checks its base);
  *   - branch-overlay table views ([[withParentView]] — a branch's own
  *     delta tables materialize lazily on first append, until then the
  *     view is the parent's alone);
  *   - the one bucketed write idiom every build/append/snapshot/compact
  *     path uses ([[writeBucketed]]: repartition on the bucket key so
  *     each bucket lands as ONE file, then bucketBy/sortBy/saveAsTable
  *     to a session-scoped scratch path);
  *   - [[drop]] / [[branch]] / [[snapshot]] / [[compact]] themselves.
  *
  * Each concrete index keeps its own BUILD (how rows derive from the
  * corpus), PROBE (its query contract) and APPEND row derivation —
  * those differ for real reasons (one vs two bucketed tables, the
  * PostingsIndex BM25 stats merge, IvfIndex's shared-centroid branches
  * and [[IvfIndex.Index.retrain]]); everything above did not.
  *
  * Visibility note: everything here is `private[graft]` — the trait is
  * an implementation-sharing device, not API; the public surface stays
  * on the concrete classes.
  */
private[graft] trait PersistedIndex[Self <: PersistedIndex[Self]] { self: Self =>

  // ── state every handle carries ────────────────────────────────────
  private[graft] def spark: SparkSession
  private[graft] def baseName: String
  private[graft] def generation: Int
  private[graft] def cacheKey: String
  private[graft] def parentIndex: Option[Self]

  // ── per-class wiring (constants + companion plumbing) ─────────────
  /** Class name for stale-handle messages, e.g. "MinhashIndex" —
    * specs assert the "stale <kind> handle" fragment. */
  private[graft] def kindName: String
  /** BuildLog tag stem, e.g. "minhash" → "minhash-branch:<base>". */
  private[graft] def logTag: String
  /** Scratch table-name prefix, e.g. "graft_mh". */
  private[graft] def scratchPrefix: String
  /** Every persisted table of this index, primary ("" suffix) FIRST —
    * suffix, bucket key, bucket count. A def, not a val: IvfIndex's
    * bucket count is per-handle state (numCentroids). */
  private[graft] def tableSpecs: Seq[PersistedIndex.TableSpec]
  private[graft] def cacheGet(key: String): Self
  private[graft] def cachePut(key: String, v: Self): Unit
  private[graft] def cacheRemoveEntry(key: String, v: Self): Unit
  private[graft] def freshSeqNext(): Int
  /** Construct a sibling handle carrying THIS handle's extra state
    * (band geometry, centroids, BM25 stats, …) at the given identity. */
  private[graft] def make(baseName: String, generation: Int, cacheKey: String,
      parent: Option[Self]): Self

  // ── shared lifecycle ──────────────────────────────────────────────

  /** Catalog name of this generation's primary table: compaction
    * rewrites into a fresh `_gN` table (a reader of the old generation
    * is never raced by its deletion mid-scan — the swap is
    * drop-after-write). */
  final def tableName: String =
    if (generation == 0) baseName else s"${baseName}_g$generation"

  private[graft] final def nameFor(spec: PersistedIndex.TableSpec,
      base: String = tableName): String = base + spec.suffix

  /** Fail fast on a handle whose generation was compacted/retrained
    * away — a stale handle would otherwise surface as a bare
    * missing-table error on its next probe/append (r7 ADVICE). A
    * branch also checks its base: probes against a compacted-away
    * parent must fail with the actionable message too. */
  private[graft] final def assertCurrent(): Unit = {
    val c = cacheGet(cacheKey)
    if (c != null && (c ne this) && c.generation != generation)
      throw new IllegalStateException(
        s"stale $kindName handle: generation $generation was compacted away " +
          s"(current generation ${c.generation}) — use the instance returned by " +
          s"compact(), or re-resolve via $kindName.of()")
    parentIndex.foreach(_.assertCurrent())
  }

  /** A [[branch]]'s own delta tables materialize lazily on first
    * append (mode("append") creates them); until then the view is the
    * parent's alone. For a base handle the view is just its table. */
  private[graft] final def withParentView(own: String,
      view: Self => DataFrame): DataFrame =
    (parentIndex.map(view) ++
      (if (parentIndex.isEmpty || spark.catalog.tableExists(own))
        Seq(spark.table(own)) else Nil))
      .reduce(_ union _)

  /** Bucket-prune a probe's corpus-table scan to the delta's key set
    * (`[scale] probe_bucket_prune_keys`, default 0 = off): when the
    * knob is on and `distinctKeys` (the probe's already-checkpointed
    * DISTINCT delta-key frame) holds ≤ cap keys, collect them and
    * return `corpus` filtered by an IN list on its bucket column —
    * which FileSourceStrategy turns into bucket pruning
    * (`SelectedBucketsCount` in the scan; the `ann_ivf` cid-list
    * idiom, ProbeBucketPruneSpec plan-pins it). Over the cap, or with
    * the knob off, the unfiltered scan returns unchanged. Correctness
    * is free: the probe equi-joins `corpus` on exactly this key, so
    * restricting the scan to the join's own key set removes only rows
    * the join would drop (null keys never equi-match, so skipping
    * them in the IN list loses nothing). The collect is one
    * delta-sized job — worth paying when the table has enough buckets
    * that most files fall outside the delta's key set (thousands of
    * buckets at 100 TB, not the gates' 32 — SURVEY §9.10).
    *
    * Win condition: pruning pays only while keys ≪ buckets — at k
    * keys over B buckets the expected hit fraction is 1 − e^(−k/B),
    * and the IN filter costs a per-row set probe on every surviving
    * row regardless (measured: a 1600-key list over 2048 buckets
    * prunes ~45% of files but reads SLOWER at local[32],
    * `BENCH_probe_prune.json`). The filter therefore applies only
    * when k ≤ buckets/[[PersistedIndex.PruneKeysBucketFraction]]
    * (≥ ~78% of files skipped); larger deltas keep the unfiltered
    * scan. */
  private[graft] final def pruneScanToKeys(corpus: DataFrame, keyCol: String,
      distinctKeys: DataFrame): DataFrame = {
    val cap = IndexMaintenance.probeBucketPruneKeys
    if (cap <= 0) corpus
    else {
      val buckets = tableSpecs.find(_.bucketKey == keyCol)
        .map(_.buckets).getOrElse(Int.MaxValue)
      val limit = math.min(cap.toLong, buckets.toLong /
        PersistedIndex.PruneKeysBucketFraction).toInt
      if (limit <= 0) corpus
      else {
        // Nulls are excluded BEFORE the limit: a null key never
        // equi-matches so it carries no information, but if it
        // consumed a sample slot the over-cap check could pass on an
        // INCOMPLETE key set and the pruned scan would drop corpus
        // rows for the uncollected keys — a wrong-results path, not a
        // perf nit.
        val ks = distinctKeys.na.drop()
          .limit(limit + 1).collect().map(_.get(0))
        if (ks.length > limit) corpus
        else corpus.filter(col(keyCol).isin(ks.toIndexedSeq: _*))
      }
    }
  }

  /** The one bucketed write idiom: ONE shuffle on the bucket key so
    * each bucket lands as a single file per task (the bucketed-table
    * writer emits one file per (task, bucket) — without the
    * repartition a 32-partition input fans out into up to 32×buckets
    * small files and every probe pays the file-open overhead). */
  private[graft] final def writeBucketed(df: DataFrame, table: String,
      bucketKey: String, buckets: Int, mode: String): Unit =
    df.repartition(buckets, col(bucketKey))
      .write.mode(mode)
      .bucketBy(buckets, bucketKey).sortBy(bucketKey)
      .option("path", Scratch.dir(table))
      .saveAsTable(table)

  private def dropTablesAt(base: String): Unit =
    tableSpecs.foreach { ts =>
      val t = nameFor(ts, base)
      spark.sql(s"DROP TABLE IF EXISTS $t")
      Scratch.delete(t)
    }

  /** Rewrite every table from its PATH into `destBase` with one file
    * per bucket. Path reads, not table reads: a bucketed-table scan
    * advertises HashPartitioning(bucketKey), which lets Catalyst elide
    * the repartition — while the actual read coalesces files
    * arbitrarily, splitting one bucket across tasks and writing MORE
    * per-(task,bucket) files than before. The raw file scan keeps the
    * shuffle, so each output task holds exactly one bucket and writes
    * exactly one file. */
  private def rewriteTablesTo(destBase: String): Unit =
    tableSpecs.foreach { ts =>
      val t = nameFor(ts, destBase)
      spark.sql(s"DROP TABLE IF EXISTS $t")
      writeBucketed(spark.read.parquet(Scratch.dir(nameFor(ts))),
        t, ts.bucketKey, ts.buckets, "overwrite")
    }

  /** Drop this handle's own tables and scratch dirs NOW — the
    * lifecycle end of a `fresh()` index, a [[branch]] overlay or a
    * [[snapshot]] clone (cached of() indexes live for the session and
    * never need this). Releases this handle's cache entry if it holds
    * one (compact()/retrain() on a caller-owned fresh index puts its
    * key; without the remove, every dropped rotation would leak an
    * entry pinning the dead handle forever). No-op for branches and
    * for handles whose key maps elsewhere. */
  final def drop(): Unit = {
    dropTablesAt(tableName)
    cacheRemoveEntry(cacheKey, self)
  }

  /** Caller-owned ZERO-COPY branch (r9 VERDICT #4 / r10 VERDICT #5):
    * an empty overlay whose table views union the base tables (scanned
    * in place, never copied) with the branch's own delta tables, which
    * materialize lazily on first append. Appends land on the overlay
    * only; the base never sees them; [[drop]] deletes the overlay and
    * leaves the base intact. Per evolve invocation the cost is
    * therefore probe + delta-sized appends — nothing corpus-sized, not
    * even a byte copy. Disjointness guards and probes run against the
    * UNIONed view, so branch semantics ≡ an appended full index (each
    * index's spec pins it). Index-specific state rides along per
    * class: IvfIndex branches SHARE the base's frozen centroids;
    * PostingsIndex branches start at the base's BM25 stats and merge
    * per append. [[compact]]/[[snapshot]] stay base-only operations
    * (they rewrite from this handle's own paths, which for a branch
    * hold just the delta). */
  final def branch(): Self = {
    assertCurrent()
    graft.util.BuildLog.timed(s"$logTag-branch:$baseName") {
      val k = s"branch|$baseName#${freshSeqNext()}"
      make(Scratch.tableName(spark, scratchPrefix, k), 0,
        Scratch.sessionId(spark) + "|" + k, Some(self))
    }
  }

  /** Caller-owned copy-on-write SNAPSHOT: every bucketed table is
    * rewritten byte-for-byte into a fresh caller-owned name with NO
    * recompute of the indexed rows (the clone moves the index's
    * serialized bytes, never the corpus text/vectors — it skips the
    * scan + kernel work a fresh build pays). Build the shared of()
    * index once per session, snapshot() per index-MUTATING run, append
    * freely, [[drop]] when done — the session's probe indexes never
    * see the appends. Each index's spec pins snapshot-probe ≡
    * source-probe and append isolation. */
  final def snapshot(): Self = {
    assertCurrent()
    require(parentIndex.isEmpty,
      "snapshot() on a branch is unsupported: the branch's paths hold only its " +
        "delta — snapshot the base index")
    graft.util.BuildLog.timed(s"$logTag-snap:$baseName") {
      val k = s"snap|$baseName#${freshSeqNext()}"
      val snap = Scratch.tableName(spark, scratchPrefix, k)
      rewriteTablesTo(snap)
      make(snap, 0, Scratch.sessionId(spark) + "|" + k, None)
    }
  }

  /** Rewrite every table into a fresh generation with ONE file per
    * bucket (each append leaves a file per bucket behind; a
    * continuously-fed corpus degrades to many-small-files scans
    * without periodic compaction — probes pay a file-open per file per
    * probed bucket). Content untouched → probe results identical
    * pre/post (CompactionSpec per index); the old generation's tables
    * and files are dropped only AFTER the rewrite commits, and the
    * of() cache is refreshed with the compacted instance (prior
    * handles fail fast via [[assertCurrent]]). Resets the
    * `[scale] compact_every_appends` cadence counter. */
  final def compact(): Self = {
    assertCurrent()
    require(parentIndex.isEmpty,
      "compact() on a branch is unsupported: the branch's paths hold only its " +
        "delta — compact the base index")
    val next = s"${baseName}_g${generation + 1}"
    rewriteTablesTo(next)
    dropTablesAt(tableName)
    IndexMaintenance.resetAppend(baseName)
    val compacted = make(baseName, generation + 1, cacheKey, None)
    cachePut(cacheKey, compacted)
    compacted
  }
}

private[graft] object PersistedIndex {
  /** One persisted table of an index: catalog-name suffix ("" for the
    * primary table), bucket/sort key, bucket count. */
  final case class TableSpec(suffix: String, bucketKey: String, buckets: Int)

  /** [[PersistedIndex.pruneScanToKeys]] applies its IN filter only
    * when keys ≤ buckets/this — below it the expected file skip is
    * ≥ ~78% (1 − e^(−1/4) per bucket) and dominates the per-row set
    * probe the filter adds; above it the measured net is negative
    * (`BENCH_probe_prune.json`). */
  val PruneKeysBucketFraction = 4
}
