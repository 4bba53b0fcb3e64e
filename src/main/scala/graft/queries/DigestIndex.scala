package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.TextHash
import graft.util.Scratch

/** Persisted exact-dedup digest table — the FOURTH persisted index
  * next to [[graft.search.PostingsIndex]] / [[IvfIndex]] /
  * [[MinhashIndex]] (r8 VERDICT #1): the corpus side of incremental
  * EXACT dedup is built once as `(doc_id, content_hash)` bucketed by
  * content_hash, and every ingest batch probes it for digest
  * membership instead of re-scanning the corpus TEXT to re-derive
  * digests per batch. That per-batch corpus scan was the last
  * corpus-sized stage left in `pipe_incr_clean`'s ledger —
  * `CorpusClean` documents the full-replace-vs-probe move, the same
  * one the reference makes for its FTS index (full DELETE+INSERT vs
  * standing index, `/root/reference/src/ariadne_dbt/schema.sql:201-210`).
  *
  * Probe plan (per delta batch): delta digests computed scan-locally;
  * the delta's DISTINCT digest set broadcasts against the bucketed
  * corpus table (map-side semi-probe — the corpus scans in place, no
  * exchange), matched digests (≤ delta-sized) come back and left-join
  * the delta. A bulk re-probe past the count gate equi-joins with the
  * shuffle_hash hint instead — the [[MinhashIndex.Index.probe]]
  * discipline exactly.
  */
object DigestIndex {

  /** Bucket count — bounds probe parallelism, not correctness (the
    * [[MinhashIndex.NumBuckets]] sizing note applies). */
  val NumBuckets = 32

  /** Delta digest sets above this stop broadcasting into the corpus
    * membership probe and fall back to a shuffle_hash equi-join (the
    * corpus table still never re-shuffles — keys move to its buckets).
    * 4M 32-char digests ≈ a few hundred MB of hash relation, the same
    * envelope as [[MinhashIndex.ProbeBroadcastMaxKeys]]. */
  val ProbeBroadcastMaxKeys: Long = 4L * 1000 * 1000

  final class Index private[DigestIndex] (spark: SparkSession,
      baseName: String, private[DigestIndex] val generation: Int, cacheKey: String,
      parent: Option[Index] = None) {

    def tableName: String =
      if (generation == 0) baseName else s"${baseName}_g$generation"

    /** compact() swaps the of() cache to the next generation; a handle
      * obtained before the compaction must fail fast with an
      * actionable message, not a bare missing-table error (the
      * [[MinhashIndex]] stale-handle discipline). A branch also checks
      * its base. */
    private def assertCurrent(): Unit = {
      val c = DigestIndex.cache.get(cacheKey)
      if (c != null && (c ne this) && c.generation != generation)
        throw new IllegalStateException(
          s"stale DigestIndex handle: generation $generation was compacted away " +
            s"(current generation ${c.generation}) — use the instance returned by " +
            "compact(), or re-resolve via DigestIndex.of()")
      parent.foreach(_.assertCurrent())
    }

    /** (doc_id, content_hash), bucketed by content_hash; for a
      * [[branch]], the base's table UNIONed with the branch's delta
      * rows (the delta table materializes lazily on first append). */
    def digests: DataFrame = {
      assertCurrent()
      (parent.map(_.digests) ++
        (if (parent.isEmpty || spark.catalog.tableExists(tableName))
          Seq(spark.table(tableName)) else Nil))
        .reduce(_ union _)
    }

    /** Per delta document (doc_id, text): its digest and whether ANY
      * indexed document shares it — (doc_id, content_hash, in_corpus).
      * Within-batch duplicate handling stays with the caller (first-id
      * keeps is batch policy, not index state). */
    def probe(delta: DataFrame,
        broadcastMaxKeys: Long = DigestIndex.ProbeBroadcastMaxKeys): DataFrame = {
      assertCurrent()
      val hashed = delta
        .select(col("doc_id"), TextHash.contentDigest(col("text")).as("content_hash"))
        .localCheckpoint(false)
      val deltaKeys = hashed.select(col("content_hash")).distinct()
        .localCheckpoint(false)
      val smallDelta = deltaKeys.count() <= broadcastMaxKeys
      val keyed = if (smallDelta) broadcast(deltaKeys) else deltaKeys.hint("shuffle_hash")
      // Corpus rows of colliding digests only — the corpus table scans
      // in place (bucketed, no exchange); output is ≤ delta-sized.
      val matched = digests.join(keyed, "content_hash")
        .select(col("content_hash")).distinct()
      hashed.join(
          (if (smallDelta) broadcast(matched) else matched.hint("shuffle_hash"))
            .withColumn("in_corpus", lit(true)),
          Seq("content_hash"), "left")
        .select(col("doc_id"), col("content_hash"),
          coalesce(col("in_corpus"), lit(false)).as("in_corpus"))
    }

    /** Incrementally index `newDocs` ((doc_id, text) rows with NEW doc
      * ids — enforced by a broadcast semi-probe guard, the
      * [[MinhashIndex.Index.append]] contract; duplicate CONTENT is of
      * course allowed — that is what the index detects). */
    def append(newDocs: DataFrame): Index = {
      assertCurrent()
      // ONE delta materialization for guard + write (round 12: the
      // former deltaIds checkpoint scanned the delta once for the
      // guard and the write scanned it AGAIN for the digests; hashing
      // before the guard wastes only the digest column when the guard
      // trips — the contract-violation path, not the hot path).
      val hashed = newDocs
        .select(col("doc_id"), TextHash.contentDigest(col("text")).as("content_hash"))
        .localCheckpoint()
      val clashes = digests.select(col("doc_id"))
        .join(broadcast(hashed.select(col("doc_id"))), "doc_id").limit(1).count()
      require(clashes == 0,
        s"append violates the disjointness contract: delta contains doc_ids already in " +
          s"$tableName — rebuild or compact to reconcile")
      hashed
        .repartition(DigestIndex.NumBuckets, col("content_hash"))
        .write.mode("append")
        .bucketBy(DigestIndex.NumBuckets, "content_hash").sortBy("content_hash")
        .option("path", Scratch.dir(tableName))
        .saveAsTable(tableName)
      // [scale] compact_every_appends cadence — base tables only
      if (parent.isEmpty && IndexMaintenance.appendTick(baseName)) compact()
      else this
    }

    /** Drop the table and its scratch dir NOW — the lifecycle end of a
      * [[DigestIndex.fresh]] index (cached of() indexes live for the
      * session and never need this). */
    def drop(): Unit = {
      spark.sql(s"DROP TABLE IF EXISTS $tableName")
      Scratch.delete(tableName)
      // Release this handle's cache entry if it holds one (compact()
      // on a caller-owned fresh index cache.put()s its key — see
      // IvfIndex.drop). No-op for branches.
      DigestIndex.cache.remove(cacheKey, this)
    }

    /** Caller-owned ZERO-COPY branch ([[MinhashIndex.Index.branch]]
      * exactly): an empty overlay whose [[digests]] view unions the
      * base table (scanned in place, never copied) with the branch's
      * own delta table — appends land on the overlay only, [[drop]]
      * deletes the overlay and leaves the base intact. Per-invocation
      * cost for an index-mutating pipeline: probe + delta-sized
      * appends, nothing corpus-sized. DigestIndexSpec pins branch
      * semantics ≡ an appended full index and append isolation. */
    def branch(): Index = {
      assertCurrent()
      graft.util.BuildLog.timed(s"digest-branch:$baseName") {
        val k = s"branch|$baseName#${DigestIndex.freshSeq.incrementAndGet()}"
        new Index(spark, Scratch.tableName(spark, "graft_dg", k), 0,
          Scratch.sessionId(spark) + "|" + k, parent = Some(this))
      }
    }

    /** Caller-owned copy-on-write SNAPSHOT of this index
      * ([[MinhashIndex.Index.snapshot]] exactly): the bucketed table
      * is rewritten byte-for-byte into a fresh caller-owned name with
      * NO digest recompute — the clone moves the index's serialized
      * bytes, never the corpus text, so it skips the text scan and
      * normalization+md5 that [[DigestIndex.fresh]] pays. Build the
      * shared [[DigestIndex.of]] index once per session, `snapshot()`
      * per index-MUTATING run, append freely, [[drop]] when done — the
      * session's probe indexes never see the appends. DigestIndexSpec
      * pins snapshot-probe ≡ source-probe and append isolation. */
    def snapshot(): Index = {
      assertCurrent()
      require(parent.isEmpty,
        "snapshot() on a branch is unsupported: the branch's paths hold only its " +
          "delta — snapshot the base index, or rebuild via fresh()")
      graft.util.BuildLog.timed(s"digest-snap:$baseName") {
        val k = s"snap|$baseName#${DigestIndex.freshSeq.incrementAndGet()}"
        val snap = Scratch.tableName(spark, "graft_dg", k)
        spark.sql(s"DROP TABLE IF EXISTS $snap")
        spark.read.parquet(Scratch.dir(tableName))
          .repartition(DigestIndex.NumBuckets, col("content_hash"))
          .write.mode("overwrite")
          .bucketBy(DigestIndex.NumBuckets, "content_hash").sortBy("content_hash")
          .option("path", Scratch.dir(snap))
          .saveAsTable(snap)
        new Index(spark, snap, 0, Scratch.sessionId(spark) + "|" + k)
      }
    }

    /** Rewrite into a fresh generation with ONE file per bucket (each
      * append leaves a file per bucket behind). Content untouched →
      * probes identical pre/post; path reads, not table reads — see
      * [[IvfIndex.Index.compact]] for why. */
    def compact(): Index = {
      assertCurrent()
      require(parent.isEmpty,
        "compact() on a branch is unsupported: the branch's paths hold only its " +
          "delta — compact the base index")
      val next = s"${baseName}_g${generation + 1}"
      spark.sql(s"DROP TABLE IF EXISTS $next")
      spark.read.parquet(Scratch.dir(tableName))
        .repartition(DigestIndex.NumBuckets, col("content_hash"))
        .write.mode("overwrite")
        .bucketBy(DigestIndex.NumBuckets, "content_hash").sortBy("content_hash")
        .option("path", Scratch.dir(next))
        .saveAsTable(next)
      spark.sql(s"DROP TABLE IF EXISTS $tableName")
      Scratch.delete(tableName)
      IndexMaintenance.resetAppend(baseName)
      val compacted = new Index(spark, baseName, generation + 1, cacheKey)
      cache.put(cacheKey, compacted)
      compacted
    }
  }

  private val cache = new ConcurrentHashMap[String, Index]()

  /** Build-or-reuse the index for `corpusKey`; `corpus` is by-name —
    * on a cache hit it never evaluates. */
  def of(spark: SparkSession, corpusKey: String, corpus: => DataFrame): Index = {
    val key = Scratch.sessionId(spark) + "|" + corpusKey
    cache.computeIfAbsent(key, _ => graft.util.BuildLog.timed(s"digest:$corpusKey") {
      build(spark, corpusKey, corpus, key)
    })
  }

  private val freshSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Build an UNcached, caller-owned index (the [[MinhashIndex.fresh]]
    * contract: per-invocation mutation must never leak into the shared
    * of() instances; call [[Index.drop]] when done). */
  def fresh(spark: SparkSession, corpusKey: String, corpus: DataFrame): Index =
    graft.util.BuildLog.timed(s"digest-fresh:$corpusKey") {
      val k = s"$corpusKey#${freshSeq.incrementAndGet()}"
      build(spark, k, corpus, Scratch.sessionId(spark) + "|" + k)
    }

  private def build(spark: SparkSession, corpusKey: String, corpus: DataFrame,
      cacheKey: String): Index = {
    val tableName = Scratch.tableName(spark, "graft_dg", corpusKey)
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    corpus
      .select(col("doc_id"), TextHash.contentDigest(col("text")).as("content_hash"))
      .repartition(NumBuckets, col("content_hash"))
      .write.mode("overwrite")
      .bucketBy(NumBuckets, "content_hash").sortBy("content_hash")
      .option("path", Scratch.dir(tableName))
      .saveAsTable(tableName)
    new Index(spark, tableName, 0, cacheKey)
  }
}
