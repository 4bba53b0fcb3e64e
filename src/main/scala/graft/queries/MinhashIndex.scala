package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.util.Scratch

/** Persisted MinHash+LSH index — the near-dup counterpart of
  * [[graft.search.PostingsIndex]] / [[IvfIndex]]: the corpus side of
  * incremental near-dup detection is BUILT ONCE and probed by every
  * ingest batch, so probe cost scales with the delta, never the
  * corpus. ([[Dedup.incrementalNearDup]] carries the same semantics
  * as a self-contained gate query, but rebuilds the corpus bands and
  * shingle frame on every call — the shape this index exists to
  * retire in a standing pipeline.)
  *
  * Two bucketed tables per corpus, BOTH built scan-locally (the
  * `graft_minhash` / `graft_shingles` kernels — zero shuffle except
  * the bucket-write repartitions):
  *
  *   - `<name>`     : (doc_id, band_key) — 16 band keys per doc,
  *                    bucketed by band_key, so the probe's collision
  *                    join reads matching buckets without shuffling
  *                    the corpus band table;
  *   - `<name>_arr` : (doc_id, hs) — the doc's sorted distinct
  *                    shingle-hash array, bucketed by doc_id, so the
  *                    verifier's corpus-side array attach join skips
  *                    its exchange.
  *
  * Probe plan (per delta batch): delta bands + arrays computed
  * scan-locally; the delta's distinct band keys BROADCAST against the
  * corpus band table (map-side semi-probe — the corpus never
  * shuffles); hot-band cap applied to the COMBINED per-key count
  * (corpus hits + delta rows — identical to
  * [[Dedup.capHotBands]] over the union, because keys on one side
  * only produce no candidates); codegen `array_intersect` exact
  * verify; best match + is_new per delta doc. MinhashIndexSpec pins
  * row equality with [[Dedup.incrementalNearDup]] and the no-exchange
  * corpus scans.
  *
  * Lifecycle (drop/branch/snapshot/compact, stale-handle fail-fast,
  * auto-compact cadence) is the shared [[PersistedIndex]] contract.
  */
object MinhashIndex {

  /** Default bucket count for both tables — 100 TB sizing note:
    * production sets `[scale] index_buckets` to ~corpus_bytes / a
    * 128 MB–1 GB file target (thousands at 100 TB, where probe-side
    * bucket pruning starts paying); the count bounds probe
    * parallelism and file sizing, not correctness, and rides the
    * handle from build time ([[IndexMaintenance.indexBuckets]]). */
  val NumBuckets = 32

  /** Delta band-key sets above this stop broadcasting into the
    * corpus-band collision join and fall back to an equi-join against
    * the bucketed table (keys shuffle to the corpus's buckets; the
    * corpus still never re-shuffles). The broadcast is the right probe
    * shape only while delta ≪ corpus — a BULK re-probe (delta ≈
    * corpus) has ~16·|delta| keys and would grow the broadcast with
    * the corpus (r7 VERDICT task 7). */
  val ProbeBroadcastMaxKeys: Long = 4L * 1000 * 1000

  final class Index private[MinhashIndex] (
      private[graft] val spark: SparkSession,
      private[graft] val baseName: String,
      private[graft] val generation: Int,
      private[graft] val cacheKey: String,
      private[graft] val parentIndex: Option[Index] = None,
      private[graft] val buckets: Int = MinhashIndex.NumBuckets)
    extends PersistedIndex[Index] {

    def arraysTable: String = tableName + "_arr"

    private[graft] def kindName = "MinhashIndex"
    private[graft] def logTag = "minhash"
    private[graft] def scratchPrefix = "graft_mh"
    private[graft] def tableSpecs = Seq(
      PersistedIndex.TableSpec("", "band_key", buckets),
      PersistedIndex.TableSpec("_arr", "doc_id", buckets))
    private[graft] def cacheGet(key: String): Index = MinhashIndex.cache.get(key)
    private[graft] def cachePut(key: String, v: Index): Unit =
      MinhashIndex.cache.put(key, v)
    private[graft] def cacheRemoveEntry(key: String, v: Index): Unit =
      MinhashIndex.cache.remove(key, v)
    private[graft] def freshSeqNext(): Int = MinhashIndex.freshSeq.incrementAndGet()
    private[graft] def make(baseName: String, generation: Int, cacheKey: String,
        parent: Option[Index]): Index =
      new Index(spark, baseName, generation, cacheKey, parent, buckets)

    /** (doc_id, band_key), bucketed by band_key; for a [[branch]], the
      * base's table UNIONed with the branch's delta rows. */
    def bands: DataFrame = withParentView(tableName, _.bands)
    /** (doc_id, hs sorted array<long>), bucketed by doc_id; branch as
      * with [[bands]]. */
    def arrays: DataFrame = withParentView(arraysTable, _.arrays)

    /** Flag each delta document (doc_id, text) that is a near-dup
      * (J ≥ [[Dedup.JaccardThreshold]]) of an INDEXED document: best
      * match (max jaccard, ties to smallest corpus id) + `is_new`
      * verdict per delta doc — the [[Dedup.incrementalNearDup]]
      * contract against the persisted corpus. */
    def probe(delta: DataFrame, cap: Int = Dedup.MaxBandSize,
        broadcastMaxKeys: Long = MinhashIndex.ProbeBroadcastMaxKeys): DataFrame =
      probeRows(delta, cap, broadcastMaxKeys).orderBy(col("doc_id"))

    /** [[probe]] without the final global doc_id sort — for COMPOSING
      * callers (the incremental ledger, the streaming sink) where the
      * verdicts feed a join or a parquet append and the range exchange
      * the orderBy plans is pure waste; the gate-facing [[probe]] keeps
      * the sorted contract its oracle pins. */
    private[graft] def probeRows(delta: DataFrame, cap: Int = Dedup.MaxBandSize,
        broadcastMaxKeys: Long = MinhashIndex.ProbeBroadcastMaxKeys): DataFrame =
      probeDerived(deriveRows(delta), cap, broadcastMaxKeys)

    /** The delta's derived rows — (doc_id, sig, hs) with null-sig
      * (shingle-less) docs KEPT, lazily checkpointed so the
      * `graft_minhash`/`graft_shingles` kernels run ONCE per batch.
      * The pre-derived-delta contract (r14 VERDICT #3): a standing
      * pipeline hands the SAME frame to [[probeDerived]] and (filtered
      * to accepted ids) to [[appendDerived]]. */
    private[graft] def deriveRows(delta: DataFrame): DataFrame = {
      graft.functions.MinhashSig.register(spark)
      delta
        .select(col("doc_id"), expr("graft_minhash(text)").as("sig"),
          expr("graft_shingles(text)").as("hs"))
        .localCheckpoint(false)
    }

    /** [[probeRows]] over pre-derived rows — any frame carrying
      * (doc_id, sig, hs); extra columns are ignored. Verdict rows
      * cover EVERY derived doc_id (null-sig docs report is_new). */
    private[graft] def probeDerived(derived: DataFrame, cap: Int = Dedup.MaxBandSize,
        broadcastMaxKeys: Long = MinhashIndex.ProbeBroadcastMaxKeys,
        smallDeltaHint: Option[Boolean] = None): DataFrame = {
      assertCurrent()
      graft.functions.MinhashSig.register(spark)
      val sigged = derived.select(col("doc_id"), col("sig"), col("hs"))
      val deltaBands = sigged.filter(col("sig").isNotNull)
        .select(col("doc_id"), explode(array(MinhashIndex.bandKeysOfSig: _*)).as("band_key"))
        .localCheckpoint(false)

      // Corpus rows of colliding keys only. Count-gated shape (the
      // count is a delta-sized agg over the checkpointed bands): an
      // incremental batch (delta ≪ corpus) BROADCASTS its key set —
      // the corpus band table is scanned in place (bucketed, no
      // exchange) and everything else is delta-sized; a bulk re-probe
      // past the gate equi-joins instead (keys shuffle to the corpus's
      // buckets — the shuffle_hash hint pins the strategy so neither
      // the planner's propagated origin stats nor AQE re-broadcast a
      // frame the gate decided is too big).
      //
      // In the small-delta case the collision probe is a LEFT SEMI
      // against the delta's RAW key column (r16 probe-fusion round): a
      // semi join deduplicates by definition, so the distinct stage
      // that used to feed the inner join disappears from the hot path.
      // `collidingKeys` stays as the count-gate / bucket-prune frame
      // (the gate path counts it; the prune knob collects it) and as
      // the bulk path's join side, where distinct keys keep the
      // shuffled row count minimal.
      val collidingKeys = deltaBands.select(col("band_key")).distinct()
        .localCheckpoint(false)
      // smallDeltaHint: caller-asserted delta ≪ corpus skips the
      // count-gate job (the [[DigestIndex.Index.probeDerived]] note).
      val smallDelta =
        smallDeltaHint.getOrElse(collidingKeys.count() <= broadcastMaxKeys)
      def keyProbe(keys: DataFrame): DataFrame =
        if (smallDelta) broadcast(keys) else keys.hint("shuffle_hash")
      val prunedBands = pruneScanToKeys(bands, "band_key", collidingKeys)
      val corpusHits = (if (smallDelta)
          prunedBands.join(broadcast(deltaBands.select(col("band_key"))),
            Seq("band_key"), "left_semi")
        else prunedBands.join(collidingKeys.hint("shuffle_hash"), "band_key"))
        .localCheckpoint(false)

      // Combined hot-band cap: corpus hits + delta rows per key ==
      // capHotBands' window count over the union (keys absent from one
      // side yield no candidates, so uncounted rows don't matter — the
      // cn>0 ∧ dn>0 filter reproduces the former inner join). ONE
      // union-aggregate computes both sides' counts (r16: the former
      // two groupBys + join paid an extra shuffle stage and a join for
      // the same kept-key set; both count frames are colliding-keys-
      // sized, so one agg over the tagged union is strictly less work).
      val keptKeys = deltaBands
        .select(col("band_key"), lit(1L).as("dn0"), lit(0L).as("cn0"))
        .unionAll(corpusHits
          .select(col("band_key"), lit(0L).as("dn0"), lit(1L).as("cn0")))
        .groupBy(col("band_key"))
        .agg(sum(col("dn0")).as("dn"), sum(col("cn0")).as("cn"))
        .filter(col("cn") > 0 && col("dn") > 0 && col("cn") + col("dn") <= cap)
        .select(col("band_key"))

      // Delta rows of kept keys ⋈ corpus hits (corpus rows of dropped
      // keys can't match — the key filter needs only one side).
      // keptKeys ⊆ collidingKeys, so it rides the same gate decision.
      val candPairs0 = deltaBands.join(keyProbe(keptKeys), "band_key").as("x")
        .join(corpusHits.as("y"), Seq("band_key"))
        .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
        .distinct()
      // Verify-side scan pruning (r16, under the same [scale]
      // probe_bucket_prune_keys knob as the band scan): the arrays
      // attach join below otherwise SCANS the whole corpus-sized
      // arrays table per probe — the bucketing only elides its
      // exchange, not its IO, and at production bucket counts the
      // candidates' dup_of ids hit a tiny fraction of the buckets.
      // With the knob on, candPairs is lazily checkpointed and its
      // distinct corpus ids become the IN list (one candidate-sized
      // collect — the pruneScanToKeys contract); knob off (the
      // gate-pinned default) leaves the plan byte-identical.
      val candPairs =
        if (IndexMaintenance.probeBucketPruneKeys > 0) candPairs0.localCheckpoint(false)
        else candPairs0
      val corpusArrays = pruneScanToKeys(arrays, "doc_id",
        candPairs.select(col("dup_of").as("doc_id")).distinct())

      // Exact verify: delta arrays ride the checkpointed sigged frame;
      // corpus arrays attach from the bucketed table (no exchange on
      // that side).
      val verified = candPairs
        .join(sigged.select(col("doc_id"), col("hs").as("hs_a")), "doc_id")
        .join(corpusArrays.select(col("doc_id").as("dup_of"), col("hs").as("hs_b")), "dup_of")
        .select(col("doc_id"), col("dup_of"),
          size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("overlap"),
          size(col("hs_a")).cast("long").as("na"), size(col("hs_b")).cast("long").as("nb"))
        .withColumn("jaccard",
          col("overlap").cast("double") / (col("na") + col("nb") - col("overlap")).cast("double"))
        .filter(col("jaccard") >= Dedup.JaccardThreshold)

      // Best match as max_by under groupBy, NOT a row_number window
      // (the IvfIndex.assign idiom, r16): partial aggregation combines
      // map-side and the shuffle needs no sort; the (jaccard, -dup_of)
      // key struct reproduces the window's (jaccard DESC, dup_of ASC)
      // order exactly — max jaccard, ties to the smallest corpus id.
      val best = verified
        .groupBy(col("doc_id"))
        .agg(max_by(struct(col("dup_of"), col("jaccard")),
          struct(col("jaccard"), -col("dup_of"))).as("b"))
        .select(col("doc_id"), col("b.dup_of").as("dup_of"),
          col("b.jaccard").as("jaccard"))
      sigged.select(col("doc_id"))
        .join(best, Seq("doc_id"), "left")
        .select(col("doc_id"), col("dup_of"), col("jaccard"),
          col("dup_of").isNull.as("is_new"))
    }

    /** Incrementally index `newDocs` ((doc_id, text) rows with NEW doc
      * ids — ENFORCED for every row that LANDS: the guard semi-joins
      * the delta's SIGNED ids against the arrays table's id column and
      * throws on overlap. Null-sig docs — no shingles — are filtered
      * before the guard because they are never written to either
      * table, so a clashing id among them passes silently rather than
      * throwing: the tables stay consistent, the caller's contract
      * violation just isn't surfaced for a row that contributes
      * nothing — r12 ADVICE, documented as the intended trade). Bands
      * and
      * arrays append scan-locally; nothing corpus-sized recomputes —
      * there are no global statistics to merge (band counts are
      * derived per probe), so probes see the appended corpus
      * immediately.
      *
      * The two table commits are not atomic, and since r16 they SUBMIT
      * CONCURRENTLY under `[scale] parallel_appends` (the PostingsIndex
      * two-table idiom): a failure between/among them can leave EITHER
      * table ahead. Both stranded states are probe-benign — arrays
      * without bands never become candidates; bands without arrays
      * become candidates whose verify-side array attach drops them —
      * i.e. the doc is "not yet discoverable" either way, exactly the
      * former arrays-first outcome. What the old serialized order
      * really bought was a CHEAPER RETRY GUARD (arrays' id set was
      * provably a superset of bands'); with concurrent commits the
      * guard probes the UNION of both tables' id sets instead, so a
      * retry after any partial failure still trips loudly rather than
      * double-writing rows (a silent bands double-write would inflate
      * the probe's hot-cap counts — a results risk, not just bloat).
      * Recovery after a tripped guard: rebuild or compact, the
      * PostingsIndex contract. MinhashAppendRecoverySpec pins the
      * guard against both stranded-table states. */
    def append(newDocs: DataFrame): Index =
      appendDerived(deriveRows(newDocs))

    /** [[append]] over pre-derived rows (the [[deriveRows]] /
      * [[probeDerived]] contract) — skips the signature/shingle
      * re-derivation when the caller already derived the batch for
      * its probe. Extra columns are ignored; null-sig rows are
      * filtered here (they never land, so the guard covers exactly
      * the rows that land — the [[append]] contract unchanged). */
    private[graft] def appendDerived(derived: DataFrame,
        assumeDisjoint: Boolean = false): Index = {
      assertCurrent()
      val sigged = derived.select(col("doc_id"), col("sig"), col("hs"))
        .filter(col("sig").isNotNull)
      // Guard on the UNION of both tables' id sets (r16, the price of
      // the concurrent two-table commit below — see [[append]]'s
      // recovery contract): a partial failure can strand EITHER table,
      // so a retry must trip whichever side landed. The bands side is
      // a single-column scan of 16×n rows where arrays is 1×n — paid
      // only on the guarded path. assumeDisjoint: caller-proven id
      // disjointness skips the guard entirely (the
      // [[DigestIndex.Index.appendDerived]] note — the guard is a
      // per-batch corpus-id scan, the append job floor at scale).
      if (!assumeDisjoint) {
        val clashes = arrays.select(col("doc_id"))
          .unionAll(bands.select(col("doc_id")))
          .join(broadcast(sigged.select(col("doc_id"))), "doc_id").limit(1).count()
        require(clashes == 0,
          s"append violates the disjointness contract: delta contains doc_ids already in " +
            s"$arraysTable or $tableName (an id present in one table but absent from the " +
            "other means a previous append failed between its two commits — rebuild or " +
            "compact to reconcile)")
      }
      // Disjoint tables off one checkpointed frame — submitted as
      // concurrent jobs under [scale] parallel_appends (the
      // PostingsIndex.appendDerived idiom; the union guard above is
      // what makes the commit order non-load-bearing). The append wall
      // was the serialized arrays-write → bands-write chain, ~2× one
      // bucketed-write commit (CLEAN_SERVE_BUDGET.json
      // minhash_append_sec 1.24 vs digest's single-table 0.54).
      graft.util.Par.join(IndexMaintenance.parallelAppends)(
        () => writeBucketed(sigged.select(col("doc_id"), col("hs")),
          arraysTable, "doc_id", buckets, "append"),
        () => writeBucketed(
          sigged.select(col("doc_id"),
            explode(array(MinhashIndex.bandKeysOfSig: _*)).as("band_key")),
          tableName, "band_key", buckets, "append"))
      // [scale] compact_every_appends cadence — base tables only
      // (a branch's appends never touch its base), probe-invariant
      if (parentIndex.isEmpty && IndexMaintenance.appendTick(baseName)) compact()
      else this
    }
  }

  /** The 16 band keys of a `graft_minhash` sig array column (same
    * xxhash64(band, minima…) keys as [[Dedup.minhashBandRows]]). */
  private[queries] def bandKeysOfSig: Seq[org.apache.spark.sql.Column] =
    (0 until Dedup.NumBands).map { b =>
      xxhash64(lit(b) +:
        (0 until Dedup.RowsPerBand).map(r => col("sig")(b * Dedup.RowsPerBand + r)): _*)
    }

  private val cache = new ConcurrentHashMap[String, Index]()

  /** Build-or-reuse the index for `corpusKey`; `corpus` is by-name —
    * on a cache hit it never evaluates. */
  def of(spark: SparkSession, corpusKey: String, corpus: => DataFrame): Index = {
    val key = Scratch.sessionId(spark) + "|" + corpusKey
    cache.computeIfAbsent(key, _ => graft.util.BuildLog.timed(s"minhash:$corpusKey") {
      build(spark, corpusKey, corpus, key)
    })
  }

  private val freshSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  /** Build an UNcached, caller-owned index — for pipelines that MUTATE
    * their index per invocation (the evolving-corpus gate appends every
    * batch's accepted docs), which must never leak into the session's
    * shared of() instances. Call [[Index.drop]] when done. */
  def fresh(spark: SparkSession, corpusKey: String, corpus: DataFrame): Index =
    graft.util.BuildLog.timed(s"minhash-fresh:$corpusKey") {
      val k = s"$corpusKey#${freshSeq.incrementAndGet()}"
      build(spark, k, corpus, Scratch.sessionId(spark) + "|" + k)
    }

  private def build(spark: SparkSession, corpusKey: String, corpus: DataFrame,
      cacheKey: String): Index = {
    graft.functions.MinhashSig.register(spark)
    val tableName = Scratch.tableName(spark, "graft_mh", corpusKey)
    val arraysTable = tableName + "_arr"
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    spark.sql(s"DROP TABLE IF EXISTS $arraysTable")
    val sigged = corpus
      .select(col("doc_id"), expr("graft_minhash(text)").as("sig"),
        expr("graft_shingles(text)").as("hs"))
      .filter(col("sig").isNotNull)
      .localCheckpoint()
    val idx = new Index(spark, tableName, 0, cacheKey,
      buckets = IndexMaintenance.indexBuckets)
    idx.writeBucketed(
      sigged.select(col("doc_id"), explode(array(bandKeysOfSig: _*)).as("band_key")),
      tableName, "band_key", idx.buckets, "overwrite")
    idx.writeBucketed(sigged.select(col("doc_id"), col("hs")),
      arraysTable, "doc_id", idx.buckets, "overwrite")
    idx
  }
}
