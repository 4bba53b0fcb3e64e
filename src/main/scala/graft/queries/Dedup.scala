package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash._

/** Deduplication operators over `documents` / `embeddings` — exact
  * hash dedup, exact n-gram Jaccard, MinHash+LSH, SimHash, and
  * embedding-cosine near-dup.
  *
  * Scale design (100 TB):
  *   - exact dedup is a single hash-partition shuffle on the content
  *     digest — the canonical first pass;
  *   - n-gram Jaccard all-pairs is quadratic in the worst case; it is
  *     the *verifier*, run only on candidate pairs. The standalone
  *     query exists as the oracle-checkable ground truth at test scale;
  *   - MinHash+LSH is the scale path: signature cost is linear in
  *     shingle count, banding turns pair discovery into an equi-join
  *     (shuffle on band key), and only band-collision candidates reach
  *     the Jaccard verifier. Hot bands (boilerplate docs) are
  *     count-capped before the self-join — see [[MaxBandSize]];
  *   - SimHash packs a document into one 60-bit word; the pigeonhole
  *     band join finds hamming-≤k pairs without comparing all pairs;
  *   - all hashes derive from md5 via [[graft.functions.TextHash.h60]],
  *     so signatures are engine-independent and every stage (not just
  *     the final pair list) is oracle-checkable in DuckDB.
  */
object Dedup {

  private[graft] val JaccardThreshold = 0.8
  private[queries] val NumPerms = 32 // 16 bands × 2 rows: P(miss | J=0.8) ≈ (1-0.64)^16 ≈ 1e-7
  private[queries] val NumBands = 16
  private[queries] val RowsPerBand = 2

  /** Hot-band candidate cap. A band key shared by m documents emits
    * m(m-1)/2 candidate pairs — a boilerplate-heavy corpus (cookie
    * banners, license headers) turns one hot key quadratic at 100 TB.
    * Bands larger than the cap are dropped BEFORE the self-join, so the
    * candidate stage is bounded at cap²/2 pairs per key. Recall is
    * unaffected for any pair that also agrees on a non-hot band (16
    * minhash bands / 4 simhash bands give every true pair multiple
    * chances); what a hot band loses is exactly the boilerplate
    * near-dup mass a production pipeline caps deliberately. At test
    * scale the largest observed band is ≲20 docs (BandCapSpec pins the
    * headroom), so the gates still match the exact all-pairs oracle. */
  private[graft] val MaxBandSize = 256

  /** Drop rows of band keys exceeding `cap` members. The window count
    * hash-partitions on the same key the candidate self-join shuffles
    * on, so the exchange is reused, not added. */
  private[graft] def capHotBands(bands: DataFrame, cap: Int, keyCols: String*): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
    bands.withColumn("_band_n", count(lit(1)).over(w))
      .filter(col("_band_n") <= cap)
      .drop("_band_n")
  }

  /** (doc_id, shingle) distinct pairs. */
  private def shingleRows(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("s"))

  /** Exact pair Jaccard over distinct 3-token shingles for pairs
    * sharing ≥1 shingle; emits pairs with J ≥ threshold. Shingle
    * identity rides the 60-bit md5 hash (see the same move in
    * [[minhashLsh]]): the self-join shuffles and compares 8-byte longs
    * instead of ~20-byte strings, exact up to 2^-60 collisions. The
    * hash stage is localCheckpoint'ed — it feeds the sharing-pair
    * self-join (both sides) and the per-doc count aggregate.
    *
    * Overlap rides the self-join's OWN output rows (r15 optimization
    * round): [[shingles]] is array_distinct, so the join emits exactly
    * ONE row per shared hash per pair and a map-side-partial
    * groupBy(pair).count() IS the intersection size — same value the
    * LSH path's array_intersect computes, same hash-identity contract.
    * The former shape fed the pairs through [[verifyJaccard]], which
    * attached both docs' full shingle arrays to every candidate and
    * re-intersected them: right for the LSH verifier (few candidates,
    * arrays beat re-deriving pairs) but strictly wasted work here,
    * where every shared hash is already a join row — on the regenerated
    * sf0.1 corpus (1.13M sharing pairs) the array attach+intersect cost
    * ~3 s of the 6.2 s row. The two count joins are |pairs|-sized
    * against a |docs|-sized frame (planner broadcasts). This operator
    * remains the documented O(n²) ORACLE-ONLY verifier — it stays in
    * the scale-strike skip contract regardless of shape. */
  private def jaccardPairs(s: SparkSession, d: String): DataFrame = {
    val sh = shingleRows(s, d)
      .select(col("doc_id"), h60(col("s")).as("h"))
      .localCheckpoint()
    val cnt = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
      .localCheckpoint(false)
    sh.as("a").join(sh.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("overlap"))
      .join(cnt.select(col("doc_id").as("doc_a"), col("n").as("na")), "doc_a")
      .join(cnt.select(col("doc_id").as("doc_b"), col("n").as("nb")), "doc_b")
      .withColumn("jaccard",
        col("overlap").cast("double") / (col("na") + col("nb") - col("overlap")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /** Ground-truth pair CTE chain (ends with CTE `j`), shared by the
    * pair oracles, the recursive-closure clustering oracle, and the
    * evolving-corpus replay oracle ([[CorpusClean]]).
    *
    * MATERIALIZED hints (round 14, here and on every multiply-
    * referenced oracle CTE below): DuckDB INLINES a CTE at each
    * reference site by default, so a chain like the K-batch evolve
    * closure — where idx{b} is referenced ~5× per batch and itself
    * chains on `j` — re-evaluated this whole shingle-overlap chain
    * combinatorially many times. Measured on the r13 artifacts at
    * sf0.01: the `pipe_incr_clean_serve` oracle alone cost 765 s of
    * the 801 s total DuckDB replay (the reason the driver's t2 gate
    * hit its wall cap and wrote `{}`); with the hints it costs 1.2 s,
    * bit-identical result. */
  private[queries] val jaccardCtes =
    """tok AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
      |sh AS MATERIALIZED (SELECT DISTINCT doc_id, s FROM (
      |  SELECT doc_id, unnest(list_transform(generate_series(1, len(ts)-2),
      |                                       i -> array_to_string(ts[i:i+2],' '))) AS s
      |  FROM tok)),
      |cnt AS MATERIALIZED (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
      |ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS overlap
      |       FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id GROUP BY 1, 2),
      |j AS MATERIALIZED (SELECT doc_a, doc_b,
      |        CAST(overlap AS DOUBLE) / CAST(ca.n + cb.n - overlap AS DOUBLE) AS jaccard
      |      FROM ov JOIN cnt ca ON doc_a = ca.doc_id JOIN cnt cb ON doc_b = cb.doc_id)""".stripMargin

  /** DuckDB mirror of [[jaccardPairs]]. */
  private val jaccardPairsSql =
    s"""WITH $jaccardCtes
       |SELECT doc_a, doc_b, jaccard FROM j WHERE jaccard >= $JaccardThreshold""".stripMargin

  /** 60-bit SimHash signature per document — tf-weighted ±1 votes per
    * bit of each token's md5-derived hash, bit set where the vote is
    * positive. All 60 bit votes are aggregated in ONE groupBy(doc_id)
    * pass (60 agg columns over the token-frequency rows) instead of
    * exploding rows × 60 through a bit-table crossJoin — same integer
    * votes, 60× less shuffle input. */
  private def simhashSig(s: SparkSession, d: String): DataFrame = {
    val tf = Tables.documents(s, d)
      .select(col("doc_id"), explode(tokens(col("text"))).as("t"))
      .groupBy("doc_id", "t").agg(count(lit(1)).as("c"))
      .withColumn("hv", h60(col("t")))
    val voteCols = (0 until 60).map { b =>
      sum(when(expr(s"shiftright(hv, $b) & 1") === 1, col("c")).otherwise(-col("c"))).as(s"v$b")
    }
    tf.groupBy("doc_id").agg(voteCols.head, voteCols.tail: _*)
      .select(col("doc_id"),
        (0 until 60).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Exact dedup: normalize → md5 → first doc_id per digest wins.
    //
    // Keeper selection is a two-stage MIN aggregation + join, NOT a
    // row_number window over content_hash (r8 VERDICT #5): a window
    // partition cannot be split, so a pathological corpus where one
    // digest covers a large fraction (the ×64 copy shape at higher
    // copy counts) serializes that fraction through one task. The agg
    // form is skew-safe twice over — partial (map-side) min collapses
    // every scan partition's contribution to one row per digest before
    // the shuffle, and the probe join back is an equi-join AQE's
    // skew-join optimization CAN split. Same answer: is_keeper ⟺
    // doc_id = min(doc_id) over the digest. ExactDedupSkewSpec pins
    // window-form equality and the window-free plan.
    "d_exact_dedup" -> ((s, d) => {
      // The narrow (doc_id, digest) frame is checkpointed: both the
      // keepers agg and the probe join consume it, and re-deriving it
      // means re-running the regexp normalization + md5 over the full
      // corpus TEXT per consumer (+10 s at ×64, measured round 9).
      val hashed = Tables.documents(s, d)
        .select(col("doc_id"),
          graft.functions.TextHash.contentDigest(col("text")).as("content_hash"))
        .localCheckpoint(false)
      val keepers = hashed.groupBy(col("content_hash"))
        .agg(min(col("doc_id")).as("keeper_id"))
      hashed.join(keepers, "content_hash")
        .select(col("doc_id"), col("content_hash"),
          (col("doc_id") === col("keeper_id")).as("is_keeper"))
        .orderBy(col("doc_id"))
    }),

    // Ground-truth near-dup: exact n-gram Jaccard ≥ 0.8 over all
    // shingle-sharing pairs.
    "d_ngram_jaccard" -> ((s, d) =>
      jaccardPairs(s, d).orderBy(col("doc_a"), col("doc_b"))),

    // MinHash+LSH: 32 md5-derived affine permutations → 16 bands × 2
    // rows → band-collision candidates → exact-Jaccard verify.
    // Matches the ground-truth oracle because recall at J≥0.8 with
    // these parameters is ~1-1e-7 and the verifier removes all false
    // positives.
    "d_minhash_lsh" -> ((s, d) => minhashLsh(s, d, MaxBandSize)),

    // SimHash signatures (see [[simhashSig]]).
    "d_simhash" -> ((s, d) => simhashSig(s, d).orderBy(col("doc_id"))),

    // SimHash near-dup PAIRS via the pigeonhole hamming band join: for
    // hamming distance ≤ 3 over 60 bits, split the signature into 4
    // bands of 15 bits — any pair within distance 3 agrees exactly on
    // ≥1 band (pigeonhole), so candidate discovery is a band-key
    // equi-join (one shuffle), not an all-pairs scan; the exact
    // `bit_count(xor)` check then removes band-collision false
    // positives. Same find-candidates/verify shape as d_minhash_lsh,
    // including the hot-band cap (see [[MaxBandSize]]).
    "d_simhash_pairs" -> ((s, d) => simhashPairs(s, d, MaxBandSize)),

    // Embedding-cosine near-dup: pairs with cosine ≥ 0.45.
    //
    // Vectors are L2-normalized ONCE into a localCheckpoint (shared by
    // both join sides — the interpreted higher-order normalization
    // lambda runs n times, not 2n²), then the pair stage is a
    // BroadcastNestedLoopJoin: the corpus streams once per partition
    // against the broadcast side, never transiting the driver, and the
    // dot product is the codegen'd `graft_dot` expression — the same
    // left-to-right fold as the DuckDB oracle, so values stay
    // bit-identical. At 100 TB exact all-pairs is not a thing — the
    // LSH/banding path (d_minhash_lsh, d_simhash_pairs) is the scale
    // route; this operator is the bounded-corpus ground-truth verifier
    // and its plan shape (broadcast + single scan) survives a corpus
    // that outgrows any single executor, unlike a driver collect.
    "d_embed_neardup" -> ((s, d) => {
      val e = normalizedVecs(s, d)
      e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
        .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
          expr("graft_dot(a.v, b.v)").as("cosine"))
        .filter(col("cosine") >= EmbedCosineThreshold)
        .orderBy(col("vec_a"), col("vec_b"))
    }),

    // Near-dup CLUSTERING: connected components over the verified
    // MinHash+LSH pair graph — the step a production dedup pipeline
    // needs between "pairs" and "keep/drop": transitively-linked
    // near-dups form ONE cluster (a~b, b~c → {a,b,c} even when a,c
    // never collide), the canonical keeper is the min doc_id. The
    // oracle replays the exact closure with a recursive CTE over the
    // ground-truth pair set.
    "d_neardup_clusters" -> ((s, d) =>
      connectedComponents(
        Tables.documents(s, d).select(col("doc_id")),
        minhashLsh(s, d, MaxBandSize).select(col("doc_a"), col("doc_b")))
        .orderBy(col("doc_id"))),

    // Quality-aware cluster dedup: the production keep/drop decision a
    // pipeline makes AFTER clustering — per near-dup cluster, keep the
    // single highest-quality member (longest n_chars; ties to the
    // smaller doc_id), not the arbitrary min-id. Rides the identical
    // CC kernel as d_neardup_clusters, then ONE cluster-keyed window
    // shuffle computes size and pick together (both windows share the
    // partitioning, so Catalyst plans a single exchange). Cluster
    // sizes are bounded by the same band-cap discipline as the pair
    // graph, so the window never sees a corpus-sized partition.
    // NOTE (r16, measured and kept): a max_by+count groupBy rewrite
    // was tried — max_by over a struct tie-break key plans as
    // SortAggregate, trading the shared window exchange+sort for
    // sort+exchange+sort with no exchange saved (10→10) and mostly-
    // singleton clusters give the partial agg nothing to collapse;
    // the targeted strike read a wash (4.32→4.59 against a +4%
    // drifting control). The window stays.
    "d_cluster_keep_best" -> ((s, d) => {
      val cc = connectedComponents(
        Tables.documents(s, d).select(col("doc_id")),
        minhashLsh(s, d, MaxBandSize).select(col("doc_a"), col("doc_b")))
      val byCluster = Window.partitionBy(col("cluster_id"))
      val pick = byCluster.orderBy(col("n_chars").desc, col("doc_id"))
      cc.select(col("doc_id"), col("cluster_id"))
        .join(Tables.documents(s, d).select(col("doc_id"), col("n_chars")), Seq("doc_id"))
        .withColumn("cluster_size", count(lit(1)).over(byCluster))
        .withColumn("rk", row_number().over(pick))
        .filter(col("rk") === 1)
        .select(col("doc_id"), col("cluster_id"), col("n_chars"), col("cluster_size"))
        .orderBy(col("doc_id"))
    }),

    // Embedding near-dup, the SCALE route: sign-LSH banded candidate
    // discovery instead of all-pairs. Eight 8-bit sign bands tile all
    // 64 dims of the normalized vector; a pair is a candidate when it
    // agrees on ANY band — band-key equi-join over the exploded band
    // table, one shuffle, capped like the text LSH paths — then the
    // exact codegen dot product keeps only cosine ≥ 0.45. Expected
    // candidates ≈ bands·n²/2⁸ ≪ n²; recall is partial by the LSH
    // contract (both engines compute the same bands, so the gate is
    // exact). This is the pair-finding shape that replaces
    // d_embed_neardup's O(n²) when the corpus outgrows a broadcast.
    "d_embed_lsh_pairs" -> ((s, d) => embedLshPairs(s, d, MaxBandSize)),

    // Multi-probe sign-LSH: the recall knob on the row above (see
    // [[embedLshPairsMulti]]) — 4 deterministic coordinate rotations
    // re-tile the 64 sign bits into different 8-bit band groups, so a
    // loose-cosine pair gets 32 chances instead of 8. Both engines
    // compute the identical rotations, so the gate is exact despite
    // LSH's partial recall; measured at sf0.1: 84 of 144 true pairs
    // vs single-probe's 33.
    "d_embed_lsh_multiprobe" -> ((s, d) =>
      embedLshPairsMulti(s, d, MaxBandSize, EmbedBandBits, 4)),

    // Incremental near-dup: probe a delta batch against the standing
    // corpus (see [[incrementalNearDup]]) — the build-once/probe-many
    // dedup shape; cost scales with the delta, the corpus never
    // self-joins.
    "d_incr_neardup" -> ((s, d) => incrementalNearDup(s, d, MaxBandSize)),

    // Incremental near-dup against the PERSISTED index
    // ([[MinhashIndex]]): identical contract and oracle as
    // d_incr_neardup, but the corpus side is the bucketed band+array
    // index built once per session and probed per batch - the
    // standing-pipeline shape where probe cost scales with the delta
    // only (the self-contained gate above rebuilds the corpus side
    // every call).
    "d_incr_indexed" -> ((s, d) => {
      val idx = incrIndex(s, d)
      idx.probe(Tables.documents(s, d)
        .filter(pmod(col("doc_id"), lit(10)) === 0)
        .select(col("doc_id"), col("text")), MaxBandSize)
    }),

    // Incremental EMBEDDING near-dup against the persisted sign-band
    // index ([[EmbedIndex]], r10 VERDICT #1): the embedding twin of
    // d_incr_indexed — the corpus side (multiprobe band table +
    // normalized vectors, both bucketed) is built once per session and
    // probed per delta batch, so incremental embedding dedup pays
    // delta-sized work only where embedLshPairsMulti re-pays the
    // corpus every call. Same 10%-delta convention; best corpus match
    // (max cosine ≥ 0.45, ties to smallest vec_id) + is_new per delta
    // vector. Both engines compute the identical rotated bands, so the
    // gate is exact despite LSH's partial recall — this gate pins BAND
    // FIDELITY (probe ≡ the self-contained multiprobe run), not
    // retrieval recall; the tier pipelines ACT on is
    // [[EmbedActThreshold]], and recall per tier is measured in
    // BENCH_embed_bands.json.
    "d_embed_incr_indexed" -> ((s, d) => {
      val idx = embedIndex(s, d)
      idx.probe(Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(10)) === 0)
        .select(col("vec_id"), col("embedding")), MaxBandSize)
    }),


    // Semantic near-dup clusters: the same connected-components kernel
    // over the embedding LSH pair graph (cosine ≥ 0.45 verified) —
    // groups of mutually/transitively similar vectors with the min
    // vec_id as canonical. Both engines derive the identical edge list
    // (deterministic sign bands + exact dot verify), so the closure is
    // oracle-exact despite LSH's partial recall.
    "d_embed_clusters" -> ((s, d) =>
      connectedComponents(
        Tables.embeddings(s, d).select(col("vec_id").as("doc_id")),
        embedLshPairs(s, d, MaxBandSize)
          .select(col("vec_a").as("doc_a"), col("vec_b").as("doc_b")))
        .select(col("doc_id").as("vec_id"), col("cluster_id"), col("is_canonical"))
        .orderBy(col("vec_id")))
  )

  /** The `d_incr_indexed` corpus index (build-or-reuse): corpus = the
    * 90% slice, keyed per sf dir PLUS a corpus fingerprint (size +
    * mtime of documents.parquet), so a testdata re-strike at the same
    * path within a live session rebuilds instead of silently probing
    * the stale persisted index (r7 ADVICE). Public so the bench's
    * untimed setup step can force the build before any measured
    * round. */
  def incrIndex(s: SparkSession, d: String): MinhashIndex.Index =
    MinhashIndex.of(s, s"incr|$d|${corpusFingerprint(d)}", Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), col("text")))

  /** The standing-corpus EXACT-dedup digest index (build-or-reuse) —
    * same 90% cohort, same fingerprint keying as [[incrIndex]]; probed
    * by `pipe_incr_clean`'s exact stage so no per-batch corpus text
    * scan remains in the incremental ledger (r8 VERDICT #1). Public so
    * the bench's untimed setup can force the build. */
  def digestIndex(s: SparkSession, d: String): DigestIndex.Index =
    DigestIndex.of(s, s"incr|$d|${corpusFingerprint(d)}", Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("doc_id"), col("text")))

  /** The standing-corpus EMBEDDING sign-band index (build-or-reuse) —
    * the `d_embed_incr_indexed` corpus: the 90% vector cohort at the
    * gate geometry (8-bit bands × 4 rotations), fingerprint-keyed on
    * embeddings.parquet. Public so the bench's untimed setup can force
    * the build. */
  def embedIndex(s: SparkSession, d: String): EmbedIndex.Index =
    EmbedIndex.of(s,
      s"incr|$d|${corpusFingerprint(d, "embeddings.parquet")}",
      Tables.embeddings(s, d)
        .filter(pmod(col("vec_id"), lit(10)) =!= 0)
        .select(col("vec_id"), col("embedding")),
      EmbedBandBits, rotations = 4)

  /** Size+mtime fingerprint of a testdata parquet, so a testdata
    * re-strike at the same path within a live session rebuilds instead
    * of silently probing a stale persisted index (r7 ADVICE). */
  private[queries] def corpusFingerprint(d: String,
      file: String = "documents.parquet"): String = {
    import java.nio.file.{Files, Paths}
    val p = Paths.get(d, file)
    if (!Files.exists(p)) "absent"
    else {
      val size = if (Files.isDirectory(p)) Files.list(p).count() else Files.size(p)
      s"$size:${Files.getLastModifiedTime(p).toMillis}"
    }
  }

  /** Connected components over an undirected pair graph by min-label
    * propagation over the graph edges PLUS the label-pointer edges —
    * the hash-to-min move (Rastogi et al., "Finding Connected
    * Components in Map-Reduce", public method): each round, every node
    * takes the min label over its graph neighbors AND over
    * `label(label(v))` (pointer jump, via the l(v)→v edge) while its
    * current root hears the minimum of everything pointing at it (via
    * the v→l(v) edge). Labels are min-monotone and stay inside the
    * component, so the fixpoint is the component-wide min; the pointer
    * edges collapse label trees geometrically, so rounds are
    * **O(log diameter)**, not O(diameter) — a 64-node chain converges
    * within 8 rounds (DedupClusterSpec pins maxRounds = 8), where
    * plain propagation needs 64.
    *
    * Scale shape: each round is ONE hash join (labels ⋈ edges′ where
    * |edges′| = |E| + 2·|touched|) + one groupBy(min) — the same
    * per-round shape as plain propagation, with the pointer edges
    * riding the existing shuffle. (A previous formulation ran the
    * pointer jump as a second self-join on the round's UNmaterialized
    * propagation frame; both join sides re-executed the propagation
    * lineage, tripling per-round cost on edge-heavy graphs — 6.8→31 s
    * at sf1 on the text near-dup gate. Union-into-the-edge-list keeps
    * one materialization and one shuffle join per round.) No
    * driver-side graph state, edges checkpointed once, label lineage
    * truncated per round (the [[graft.graph.Bfs]] lazy-checkpoint
    * idiom, so materialization piggybacks on the fixpoint probe).
    * `maxRounds` guards runaway input; hitting it throws rather than
    * returning an unconverged labeling.
    *
    * @param nodes DataFrame with `doc_id`
    * @param pairs DataFrame with `doc_a`, `doc_b` (one row per
    *              undirected edge)
    * @return (doc_id, cluster_id = min doc_id in component,
    *         is_canonical = doc_id == cluster_id)
    */
  /** Eagerly drop a localCheckpoint'd frame's blocks. Superseded
    * label rounds (and the edge frames after the fixpoint) are dead
    * the moment the next round materializes; leaving them for the
    * async ContextCleaner lets a long-lived session accumulate dead
    * blocks in the block manager until live working sets of LATER
    * queries get evicted to disk (observed: the minhash kernel ran
    * 4× slower in-suite at sf1 when it followed the cluster gates).
    * Only ever called on frames whose data is provably never needed
    * again — an unpersisted local checkpoint cannot be recomputed. */
  private[queries] def freeCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.collect {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd
    }.foreach(_.unpersist(blocking = false))

  /** @param hashToMin adds the v↔label(v) pointer edges each round
    *   (O(log diameter) convergence); `false` is the plain
    *   min-propagation fallback — O(diameter) rounds, same labels —
    *   selectable at runtime via SPARK_GRAFT_CC_MODE=plain and pinned
    *   convergent by DedupClusterSpec.
    * @param twoHop fuse TWO propagation hops per fixpoint probe
    *   (SPARK_GRAFT_CC_MODE=twohop): per-round cost at toy scale is
    *   dominated by the fixed scheduling floor of the count() job, not
    *   the joins (SURVEY §9.10 — d_embed_clusters at ×10 is six
    *   floor-bound rounds), so halving the probes buys wall-clock even
    *   though the join work per probe doubles. Convergence detection
    *   stays exact: labels are min-monotone under the deterministic
    *   hop f, so hop2 changing nothing means its input was already a
    *   fixpoint (f(l)=l), whatever hop1 did. Labels identical to the
    *   one-hop modes (DedupClusterSpec). */
  private[graft] def connectedComponents(nodes: DataFrame, pairs: DataFrame,
      maxRounds: Int = 50,
      hashToMin: Boolean = !sys.env.get("SPARK_GRAFT_CC_MODE").contains("plain"),
      twoHop: Boolean = sys.env.get("SPARK_GRAFT_CC_MODE").contains("twohop"))
      : DataFrame = {
    val p = pairs.localCheckpoint()
    val edges = p.toDF("src", "dst")
      .union(p.select(col("doc_b"), col("doc_a")).toDF("src", "dst"))
      .localCheckpoint(false)
    // Only nodes that touch an edge enter the propagation loop: in a
    // real corpus near-dups are a thin slice, and shuffling the
    // untouched majority's self-labels through every round is the
    // dominant wasted cost at scale. Singletons rejoin after the
    // fixpoint, labeled with themselves.
    val touched = edges.select(col("src").as("doc_id")).distinct()
    var labels = touched.select(col("doc_id"), col("doc_id").as("cluster_id"))
      .localCheckpoint(false)
    val ccDebug = sys.env.contains("SPARK_GRAFT_CC_DEBUG")
    var converged = false
    var round = 0
    // One propagation hop from `l`: min over graph neighbors and (in
    // hash-to-min mode) the v↔label(v) pointer edges — every label IS
    // a touched node's id (initial self-labels, preserved by min), so
    // both directions resolve; label(w) ≤ w for all w, hence the extra
    // edges are min-monotone and component-preserving. `l` is a
    // checkpoint, so the unions add no recomputation to the join.
    // Labels only ever decrease, so ONE signal detects the fixpoint:
    // the hop changed something iff some node's min-over-neighbors
    // undercut its starting label (the `chg` column).
    def hop(l: DataFrame): DataFrame = {
      val edgesPlus = if (!hashToMin) edges else edges
        .union(l.select(col("doc_id").as("src"), col("cluster_id").as("dst")))
        .union(l.select(col("cluster_id").as("src"), col("doc_id").as("dst")))
      val nbrMin = edgesPlus.join(l, edgesPlus("src") === l("doc_id"))
        .groupBy(edgesPlus("dst").as("nbr_of")).agg(min(col("cluster_id")).as("nbr_min"))
      l.join(nbrMin, l("doc_id") === nbrMin("nbr_of"), "left")
        .select(l("doc_id"),
          least(l("cluster_id"), coalesce(col("nbr_min"), l("cluster_id")))
            .as("cluster_id"),
          (col("nbr_min") < l("cluster_id")).as("chg"))
        .localCheckpoint(false)
    }
    while (!converged && round < maxRounds) {
      val roundT0 = System.nanoTime()
      // Two-hop fusion: the intermediate hop is lazily checkpointed
      // and materializes as the second hop's join consumes it — no
      // fixpoint probe (count job) of its own. hop is deterministic
      // and min-monotone, so "hop2 changed nothing" ⟺ hop2's INPUT was
      // already a fixpoint — convergence detection is exact even when
      // hop1 did change labels (that fused round then reports
      // converged with the correct final labels).
      val mid = if (twoHop) hop(labels).drop("chg") else labels
      val next = hop(mid)
      // Fixpoint probe via count(), NOT limit(1)/isEmpty: the probe is
      // what materializes the lazy checkpoint, and a short-circuiting
      // probe leaves next's unvisited partitions as lineage — which
      // freeCheckpoint(prev) below would then make unrecomputable
      // (correct but re-derived from scratch at next use: measured 3-7×
      // round-to-round variance at sf1). count() scans every partition,
      // so next (and mid, consumed by next's join) is FULLY
      // materialized before the superseded blocks are freed.
      val changed = next.filter(col("chg")).count()
      converged = changed == 0L
      val prev = labels
      labels = next.drop("chg")
      freeCheckpoint(prev)
      if (mid ne prev) freeCheckpoint(mid)
      round += 1
      if (ccDebug) System.err.println(
        f"[cc] round=$round changed=$changed twoHop=$twoHop sec=${(System.nanoTime() - roundT0) / 1e9}%.3f")
    }
    if (ccDebug)
      System.err.println(s"[cc] converged=$converged rounds=$round")
    require(converged, s"connectedComponents did not converge in $maxRounds rounds")
    freeCheckpoint(edges)
    freeCheckpoint(p)
    val singletons = nodes.select(col("doc_id"))
      .join(labels.select(col("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("cluster_id"))
    labels.union(singletons)
      .withColumn("is_canonical", col("doc_id") === col("cluster_id"))
  }

  /** Gate width for the embedding sign bands: 8 groups × 8 bits tile
    * all 64 dims — kept fixed so the DuckDB oracle replays the exact
    * band structure. Production corpora size [[embedLshPairs]]'s
    * `bandBits` up instead (12–16): band-collision candidates between
    * UNrelated vectors grow ~ groups · n² / 2^bandBits, so 8-bit keys
    * saturate as n approaches ~2⁸·(per-key cap) — the knee is measured
    * in `BENCH_embed_bands.json` ([[graft.EmbedBandKnee]]) and
    * interpreted in SURVEY §9.12. Reachable without code edits via
    * `graft.toml [scale] embed_band_bits`
    * ([[graft.config.ScaleConfig]]). */
  val EmbedBandBits = 8

  /** Cosine floor for the embedding pair-DISCOVERY surfaces (all-pairs
    * verifier, banded/multiprobe pair discovery, the persisted
    * [[EmbedIndex]] probe) — one constant so the family can never
    * drift apart from itself or the DuckDB oracles' 0.45 literal.
    * This is the floor candidates are VERIFIED against, not the tier
    * any pipeline acts on: see [[EmbedActThreshold]]. */
  private[graft] val EmbedCosineThreshold = 0.45

  /** Cosine tier the cleaning LEDGERS act on (`embed_dup` verdicts in
    * [[CorpusClean.incrLedger]] and its evolve/streaming closures) —
    * deliberately SPLIT from [[EmbedCosineThreshold]] (r11 VERDICT
    * weak row): sign-LSH at production width (16-bit bands) recalls
    * 0.3–4.9% of true mid-tier (0.45–0.7 cosine) pairs at 128k
    * vectors — the geometry cannot band ~35%-sign-flip pairs — while
    * the ≥0.9 near-identical tier recalls ≈1.0 (a ≥0.9 pair flips only
    * a few percent of sign bits; measured against seeded denominators
    * in `BENCH_embed_bands.json`). Acting at 0.45 would therefore
    * CLAIM recall the index cannot deliver; acting at 0.9 makes the
    * ledger contract match the measured geometry. The mid-tier has its
    * own recall path via IVF bucket candidates (`d_embed_neardup_ivf`)
    * for pipelines that want it — as an explicit analysis surface, not
    * a silent ledger stage. SURVEY §9.12 interprets the tiers. */
  private[graft] val EmbedActThreshold = 0.9

  /** Banded embedding pair discovery (see the map entry's doc); `cap`
    * exposed so BandCapSpec can pin capped == uncapped headroom at
    * test scale — the oracle has no cap, so the gate is honest only
    * while every band stays under it (r4 ADVICE). `bandBits` is the
    * production width knob (see [[EmbedBandBits]]): `64 / bandBits`
    * groups of consecutive dims, each band key the packed sign bits of
    * its group. Wider bands = fewer, more selective keys — candidates
    * shrink ~2^Δ per group. Recall trade: a 2w-bit band is the
    * conjunction of its two w-bit halves, so UNCAPPED pair sets
    * strictly NEST as width grows — near-identical vectors survive
    * widening (signs nearly all agree), pairs near the loose
    * 0.45-cosine floor (~35% sign flips) thin out. The hot-band cap
    * breaks nesting exactly where the narrow width saturates: a band
    * hot at w bits (dropped) can refine into under-cap 2w-bit bands,
    * so the capped WIDE run finds pairs the capped narrow run lost —
    * measured at 128k vectors, where capped 8-bit finds ZERO and
    * capped 16-bit finds 2,308. BandCapSpec pins 8 ⊇ 16 ⊇ 32 at the
    * gate scales (cap headroom there, so capped ≡ uncapped); the
    * knee artifact measures both regimes per width. */
  def embedLshPairs(s: SparkSession, d: String, cap: Int,
      bandBits: Int = EmbedBandBits): DataFrame = {
    val e = normalizedVecs(s, d)
    embedVerify(embedLshCands(e, cap, bandBits), e)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Candidate discovery for [[embedLshPairs]]: explode each vector
    * into its `64 / bandBits` sign-band keys, cap hot keys, self-join
    * on (band, key). Split out so the knee probe can count the
    * pre-verify volume — the cost driver — without paying the verify. */
  private def embedLshCands(e: DataFrame, cap: Int, bandBits: Int): DataFrame =
    // Single-probe = rotation 0 of the multiprobe kernel (identity
    // re-tiling (1, 0)): graft_bands's pk injectively packs (band,
    // key), so capping/joining on pk ≡ the former (band, key) pair.
    embedLshCandsMulti(e, cap, bandBits, rotations = 1)

  /** Exact-cosine verification of embedding candidate pairs. */
  private def embedVerify(cands: DataFrame, e: DataFrame): DataFrame =
    cands
      .join(e.select(col("vec_id").as("vec_a"), col("v").as("va")), "vec_a")
      .join(e.select(col("vec_id").as("vec_b"), col("v").as("vb")), "vec_b")
      .select(col("vec_a"), col("vec_b"), expr("graft_dot(va, vb)").as("cosine"))
      .filter(col("cosine") >= EmbedCosineThreshold)

  /** Candidate-pair count for one embedding band setting — the
    * measurement body behind [[graft.EmbedBandKnee]] (the
    * [[simhashCandidateCount]] twin: pre-verify volume is what the
    * ×64 `d_embed_lsh_pairs` row is spending its time on). */
  private[graft] def embedLshCandCount(s: SparkSession, d: String,
      cap: Int, bandBits: Int): Long =
    embedLshCands(normalizedVecs(s, d), cap, bandBits).count()

  /** GROUND-TRUTH pair count: brute-force all-pairs cosine ≥ threshold
    * (the d_embed_neardup shape, count only) — the recall denominator
    * for [[graft.EmbedBandKnee]]'s multiprobe frontier. O(n²) by
    * definition; computable up to the ×10 corpus (20k vectors ≈ 2×10⁸
    * ordered pairs) where the banded runs are measured. */
  private[graft] def embedTruePairCount(s: SparkSession, d: String): Long =
    embedTruePairs(s, d).count()

  /** The ground-truth pair frame itself (one `cosine` column, ≥ the
    * gate threshold) — the knee's tiered-recall denominators slice it
    * by cosine, because banded sign-LSH recall is a function of the
    * pair's cosine: a 0.45-cosine pair flips ~35% of sign bits and is
    * structurally hard to band, a 0.9+ near-dup flips a few percent
    * and recalls near-totally. The broadcast nested-loop runs the
    * codegen `graft_dot` over all n²/2 ordered pairs — measured ~60 s
    * for 128k vectors (8.2×10⁹ pairs) at local[32], so the truth
    * denominator is computable well past every corpus this repo
    * strikes (the r10 "uncomputable at 128k" note was wrong). */
  private[graft] def embedTruePairs(s: SparkSession, d: String): DataFrame = {
    val e = normalizedVecs(s, d)
    e.as("a").join(broadcast(e.as("b")), col("a.vec_id") < col("b.vec_id"))
      .select(expr("graft_dot(a.v, b.v)").as("cosine"))
      .filter(col("cosine") >= EmbedCosineThreshold)
  }

  /** Multiprobe candidate count (pre-verify volume) — the cost driver
    * the frontier weighs recall against. */
  private[graft] def embedLshCandCountMulti(s: SparkSession, d: String,
      cap: Int, bandBits: Int, rotations: Int): Long =
    embedLshCandsMulti(normalizedVecs(s, d), cap, bandBits, rotations).count()

  /** Multi-probe coordinate rotations: dim i of rotation r reads
    * source dim (a_r·i + b_r) mod 64 — a_r ODD makes the map a
    * bijection mod 64, so each rotation re-tiles the SAME 64 sign
    * bits into different band groups. Rotation 0 is the identity
    * ((1,0)), pinning multiprobe(R=1) ≡ the single-probe pipeline.
    * (Sign flips would add nothing: flipping a dim on both sides of
    * a pair leaves bit-agreement unchanged — only the grouping
    * matters for sign-LSH.)
    * The rotation set is PREFIX-STABLE: the first 4 entries are frozen
    * (the `d_embed_lsh_multiprobe` / `d_embed_incr_indexed` oracles
    * replay exactly that prefix), and entries 5–16 extend the recall
    * frontier for production widths — a 16-bit band that saturates
    * nothing can be compensated with more rotations instead of
    * narrower keys (frontier measured in `BENCH_embed_bands.json`,
    * reachable via `graft.toml [scale] embed_rotations`). */
  private[graft] val EmbedRotations = graft.functions.BandKeys.Rotations

  /** MULTI-PROBE banded embedding pair discovery — the recall knob
    * sign-LSH needs at a loose cosine threshold (§9.10): one probe of
    * `64/bandBits` groups catches a pair only if it agrees on some
    * contiguous group, and at cosine ~0.5 a pair flips ~35% of sign
    * bits, so single-probe recall at the 0.45 gate threshold is 23%
    * at sf0.1 (33 of 144 true pairs, measured). Each extra rotation
    * re-tiles the dims into DIFFERENT groups (deterministic affine
    * index permutations, [[EmbedRotations]]) and gives every pair
    * `rotations × groups` independent chances: measured recall
    * 33 → 54 → 84 of 144 at R = 1/2/4 (8-bit bands, sf0.1) for
    * linearly-in-R candidate cost — the standard multi-probe LSH
    * trade, and the route to HIGH recall at the wide band widths a
    * 100k+ corpus needs (a 16-bit width that saturates nothing can
    * be compensated with more rotations instead of narrower keys).
    * Candidates are a superset of every lower-R run (rotation set is
    * a prefix); the exact-cosine verify keeps the gate deterministic
    * on both engines. */
  def embedLshPairsMulti(s: SparkSession, d: String, cap: Int,
      bandBits: Int = EmbedBandBits, rotations: Int = 4): DataFrame = {
    val e = normalizedVecs(s, d)
    embedVerify(embedLshCandsMulti(e, cap, bandBits, rotations), e)
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** The SELF-CONTAINED `d_embed_incr_indexed` twin at the gate
    * geometry (8-bit × 4 rotations): multiprobe pair discovery over
    * the FULL vector table — corpus bands recomputed per call, the
    * shape [[embedIndex]]'s persisted probe exists to retire —
    * oriented delta→corpus with the gate's best-match tie rules and
    * an `is_new` verdict per delta vector. ONE definition shared by
    * EmbedIndexSpec (pins probe ≡ this) and EmbedIndexProbe (prices
    * probe vs this), so the pinned twin and the priced twin cannot
    * drift apart. Unsorted — callers order or compare as needed. */
  private[graft] def embedIncrSelfContained(s: SparkSession, d: String): DataFrame = {
    val pairs = embedLshPairsMulti(s, d, MaxBandSize, 8, 4)
    val m = pairs.select(
        when(pmod(col("vec_a"), lit(10)) === 0, col("vec_a")).otherwise(col("vec_b")).as("vec_id"),
        when(pmod(col("vec_a"), lit(10)) === 0, col("vec_b")).otherwise(col("vec_a")).as("dup_of"),
        col("cosine"))
      .filter(pmod(col("vec_id"), lit(10)) === 0 && pmod(col("dup_of"), lit(10)) =!= 0)
    val best = m.withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("vec_id"))
          .orderBy(col("cosine").desc, col("dup_of"))))
      .filter(col("rn") === 1)
      .select(col("vec_id"), col("dup_of"), col("cosine"))
    graft.Tables.embeddings(s, d).filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"))
      .join(best, Seq("vec_id"), "left")
      .select(col("vec_id"), col("dup_of"), col("cosine"),
        col("dup_of").isNull.as("is_new"))
  }

  private def embedLshCandsMulti(e: DataFrame, cap: Int, bandBits: Int,
      rotations: Int): DataFrame = {
    require(bandBits >= 1 && bandBits <= 48 && 64 % bandBits == 0,
      s"bandBits must divide 64 and leave header room in a long key (got $bandBits)")
    require(rotations >= 1 && rotations <= EmbedRotations.size,
      s"rotations in [1, ${EmbedRotations.size}] (got $rotations)")
    // One graft_bands kernel call per vector (codegen at ANY geometry —
    // the former case-when×(rotations·groups·bandBits) column formula
    // blew Janino's 64 KB method limit past ~R=4×16-bit and fell back
    // to interpreted); pk packs (rot, band, key) injectively, so the
    // cap and the self-join on pk are exactly the former three-column
    // semantics.
    graft.functions.BandKeys.register(e.sparkSession)
    val bands = capHotBands(
      e.select(col("vec_id"),
        explode(expr(s"graft_bands(v, $bandBits, $rotations)")).as("pk")),
      cap, "pk")
    bands.as("x").join(bands.as("y"),
        col("x.pk") === col("y.pk") && col("x.vec_id") < col("y.vec_id"))
      .select(col("x.vec_id").as("vec_a"), col("y.vec_id").as("vec_b"))
      .distinct()
  }

  /** L2-normalized embeddings, localCheckpoint'ed: shared by the
    * all-pairs verifier and the banded LSH pair path (the interpreted
    * normalization lambda runs n times, not per consumer). */
  private def normalizedVecs(s: SparkSession, d: String): DataFrame = {
    graft.functions.DotProduct.register(s)
    Tables.embeddings(s, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
      .localCheckpoint()
  }

  /** Hashed distinct shingle rows (doc_id, h, hm), localCheckpoint'ed.
    *
    * Checkpoint: this stage feeds four consumers (signatures, both
    * verify sides, counts) — materialize it once instead of re-running
    * explode+hash per consumer. The shingle STRING is dropped after
    * hashing: every downstream stage (perms, verify join) works on the
    * 64-bit h, so the materialized table and the verify shuffle carry
    * 8-byte longs instead of ~20-byte strings. Distinct-shingle
    * identity via h is exact up to 64-bit collisions (birthday ≈
    * n²/2⁶⁵), the same contract production shingle-hash dedup runs at
    * 100 TB.
    *
    * xxhash64, not md5-h60: every value derived from the shingle hash
    * (signature minima, band keys, verify identity) is INTERNAL — the
    * oracle checks only the final verified pairs — so the hash just
    * needs to be a consistent uniform identity, and xxhash64 is a
    * native codegen'd long vs md5's hex-string round-trip. The md5
    * discipline stays where hash VALUES cross engines (d_simhash,
    * t_fingerprint, s_stratified_sample). */
  private def hashedShingles(s: SparkSession, d: String): DataFrame =
    shingleRows(s, d)
      .select(col("doc_id"), xxhash64(col("s")).as("h"))
      .withColumn("hm", pmod(col("h"), lit(P)))
      .localCheckpoint(false)

  /** 32 minhash signature minima AND the per-doc distinct-shingle
    * count the verifier needs — computed SCAN-LOCALLY by the codegen
    * kernel [[graft.functions.MinhashSig]] (`graft_minhash`): the
    * signature is a per-document scalar, so the former
    * groupBy(doc_id).agg(32 × min) shuffled the entire shingle stream
    * (O(corpus tokens) rows) only to fold it back to one row per
    * document; the kernel folds during the corpus scan instead — zero
    * shuffle bytes for the signature stage at any corpus size.
    * MinhashSigSpec pins bit-equality with the retired aggregation
    * formulation ([[minhashSignaturesAgg]]). localCheckpoint'ed
    * because the band explode and the verifier's count side both read
    * it. */
  private def minhashSignatures(s: SparkSession, d: String, sh: DataFrame): DataFrame = {
    // SPARK_GRAFT_MINHASH_MODE=agg selects the aggregation fallback at
    // runtime (the CC plain-mode precedent: the escape hatch is tested,
    // not dead — MinhashSigSpec pins both formulations bit-identical,
    // and the A/B is how the kernel's scale benefit gets measured).
    // `sh` is the caller's already-checkpointed hashed-shingle frame,
    // so fallback mode re-aggregates it rather than re-building it.
    if (sys.env.get("SPARK_GRAFT_MINHASH_MODE").contains("agg"))
      return minhashSignaturesAgg(sh).localCheckpoint(false)
    graft.functions.MinhashSig.register(s)
    val sigCols = (0 until NumPerms).map(i => col("sig")(i).as(s"m$i")) :+
      col("sig")(NumPerms).as("n")
    Tables.documents(s, d)
      .select(col("doc_id"), expr("graft_minhash(text)").as("sig"))
      .filter(col("sig").isNotNull)
      .select(col("doc_id") +: sigCols: _*)
      .localCheckpoint(false)
  }

  /** The retired aggregation formulation of [[minhashSignatures]],
    * kept for the MinhashSigSpec parity pin (the oracle contract:
    * kernel == explode+agg, bit for bit). */
  private[graft] def minhashSignaturesAgg(sh: DataFrame): DataFrame = {
    val sigCols = (0 until NumPerms).map(i => min(minhashPerm(col("hm"), i)).as(s"m$i")) :+
      count(lit(1)).as("n")
    sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*)
  }

  /** (doc_id, band_key) rows, hot keys capped. All 16 band keys come
    * from ONE pass over sig (explode of a 16-element array) instead of
    * a 16-way union of projections; keys are xxhash64(band, row minima)
    * longs — band keys are internal to candidate discovery (the oracle
    * checks final pairs), and a key collision only adds a candidate the
    * exact verifier removes. */
  private def minhashBandRows(sig: DataFrame, cap: Int): DataFrame = {
    val bandKeys = (0 until NumBands).map { b =>
      xxhash64(lit(b) +:
        (0 until RowsPerBand).map(r => col(s"m${b * RowsPerBand + r}")): _*)
    }
    capHotBands(
      sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("band_key")),
      cap, "band_key")
  }

  /** Exact-Jaccard verification of candidate pairs ONLY — the whole
    * point of LSH: the quadratic verifier touches just the
    * band-collision pairs, not all C(n,2). `cands` carries id columns
    * `leftCol`/`rightCol`; emits those plus `jaccard` for pairs at or
    * above the threshold.
    *
    * Physical shape (round 7, probe-driven): the former formulation
    * exploded every candidate through a per-shingle equi-join
    * (|cands| × shingles-per-doc intermediate rows — 300M rows and
    * 53 of the pipeline's 69 seconds at ×64, measured by
    * [[DedupProbe]]), then folded the matches back with a pair
    * groupBy and re-joined per-doc counts twice. Instead the distinct
    * shingle hashes are collected ONCE into a sorted per-doc array
    * (one agg over the shingle frame, |docs| output rows) and each
    * candidate row computes its overlap with codegen
    * `array_intersect` — two array-attach joins at |cands| rows, no
    * explode, and na/nb fall out as `size(hs)` so the count joins
    * vanish. Same answer: overlap counts DISTINCT shared hashes,
    * which equals the old per-row match count up to 64-bit collisions
    * (the documented xxhash64 identity contract). ×64 verify:
    * 53.3 s → measured after change below; see SURVEY §9.12. */
  private def verifyJaccard(cands: DataFrame, sh: DataFrame,
      leftCol: String, rightCol: String): DataFrame = {
    val arrs = sh.groupBy("doc_id").agg(sort_array(collect_list(col("h"))).as("hs"))
      .localCheckpoint(false)
    cands
      .join(arrs.select(col("doc_id").as(leftCol), col("hs").as("hs_a")), leftCol)
      .join(arrs.select(col("doc_id").as(rightCol), col("hs").as("hs_b")), rightCol)
      .select(col(leftCol), col(rightCol),
        size(array_intersect(col("hs_a"), col("hs_b"))).cast("long").as("overlap"),
        size(col("hs_a")).cast("long").as("na"), size(col("hs_b")).cast("long").as("nb"))
      .withColumn("jaccard",
        col("overlap").cast("double") / (col("na") + col("nb") - col("overlap")).cast("double"))
      .filter(col("jaccard") >= JaccardThreshold)
      .select(col(leftCol), col(rightCol), col("jaccard"))
  }

  // Probe accessors for [[DedupProbe]] (stage-cost diagnostics only).
  private[queries] def hashedShinglesProbe(s: SparkSession, d: String): DataFrame =
    hashedShingles(s, d)
  private[queries] def minhashSignaturesProbe(s: SparkSession, d: String, sh: DataFrame): DataFrame =
    minhashSignatures(s, d, sh)
  private[queries] def minhashBandRowsProbe(sig: DataFrame, cap: Int): DataFrame =
    minhashBandRows(sig, cap)
  private[queries] def verifyJaccardProbe(cands: DataFrame, sh: DataFrame): DataFrame =
    verifyJaccard(cands, sh, "doc_a", "doc_b")

  /** MinHash+LSH near-dup pipeline body (see the `d_minhash_lsh` entry
    * in [[queries]]); `cap` is the hot-band cap, [[MaxBandSize]] in
    * production, varied by BandCapSpec. */
  private[graft] def minhashLsh(s: SparkSession, d: String, cap: Int): DataFrame = {
    val sh = hashedShingles(s, d)
    val sig = minhashSignatures(s, d, sh)
    val bands = minhashBandRows(sig, cap)
    val cands = bands.as("x").join(bands.as("y"),
        col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
    verifyJaccard(cands, sh, "doc_a", "doc_b")
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Incremental near-dup: flag each DELTA document (doc_id ≡ 0 mod 10
    * — standing in for "today's ingest batch") that is a near-dup
    * (J ≥ [[JaccardThreshold]]) of any CORPUS document, with the best
    * match (max jaccard, ties to the smallest corpus id) and an
    * `is_new` verdict per delta doc.
    *
    * This is the daily-ingest shape a 100 TB pipeline actually runs:
    * the corpus' band table is built ONCE (in production it lives as a
    * persisted table bucketed on band_key — the
    * [[graft.search.PostingsIndex]] / [[IvfIndex]] pattern), and each
    * new batch probes it with a delta-bands ⋈ corpus-bands equi-join.
    * The corpus NEVER self-joins: candidate discovery costs
    * O(|delta bands| + collisions), not O(|corpus|²), and the exact
    * verifier touches only delta×corpus collision pairs. Delta-internal
    * duplicates are the batch path's job ([[minhashLsh]] over the
    * delta), kept out of this operator's contract.
    *
    * Recall is the standard LSH contract (≥1 shared band at J ≥ 0.8
    * with probability ~1−1e-7 under 16×2 banding), so at test scale the
    * gate matches the exact all-pairs delta×corpus oracle. */
  private[graft] def incrementalNearDup(s: SparkSession, d: String, cap: Int): DataFrame = {
    val isDelta = pmod(col("doc_id"), lit(10)) === 0
    val sh = hashedShingles(s, d)
    val sig = minhashSignatures(s, d, sh)
    val bands = minhashBandRows(sig, cap)
    val cands = bands.filter(isDelta).as("x")
      .join(bands.filter(!isDelta).as("y"), col("x.band_key") === col("y.band_key"))
      .select(col("x.doc_id").as("doc_id"), col("y.doc_id").as("dup_of"))
      .distinct()
    val verified = verifyJaccard(cands, sh, "doc_id", "dup_of")
    // NOTE (r16, measured and kept as a window): a max_by-under-groupBy
    // rewrite was tried — max_by over a STRUCT tie-break key plans as
    // SortAggregate (structs aren't hash-aggregable buffers), which
    // swapped the window's one exchange+sort for sort+exchange+sort
    // with no exchange saved (plan diff: 18→18 exchanges, 6→8 sorts);
    // the window stays.
    val best = verified
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("jaccard").desc, col("dup_of"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("dup_of"), col("jaccard"))
    Tables.documents(s, d).select(col("doc_id")).filter(isDelta)
      .join(best, Seq("doc_id"), "left")
      .select(col("doc_id"), col("dup_of"), col("jaccard"),
        col("dup_of").isNull.as("is_new"))
      .orderBy(col("doc_id"))
  }

  /** SimHash pair pipeline body (see the `d_simhash_pairs` entry in
    * [[queries]]); `cap` as in [[minhashLsh]]. The gate setting:
    * 15-bit bands (4 bands over 60 bits), hamming ≤ 3. */
  private[graft] def simhashPairs(s: SparkSession, d: String, cap: Int): DataFrame =
    simhashPairsBanded(s, d, cap, bandBits = 15, maxHamming = 3)

  /** SimHash pair discovery with a PARAMETERIZED band width — the
    * knob that trades candidate volume against guaranteed radius as
    * the corpus grows. `60 / bandBits` bands tile the signature;
    * pigeonhole guarantees any pair within hamming `bands - 1` agrees
    * exactly on ≥1 band, so `maxHamming` must stay ≤ `bands - 1`.
    *
    * Scaling law: expected band collisions ≈ bands · n² / 2^(bandBits+1)
    * for random signatures — the candidate stage saturates when n
    * approaches 2^bandBits. Raising bandBits divides candidates by
    * 2^Δ per band but REMOVES guaranteed radius (fewer bands), so at a
    * fixed hamming contract the production move at larger n is a wider
    * signature (more simhash bits), not wider bands over 60. The knee
    * is measured in `BENCH_simhash_bands.json` (see [[graft.BandKnee]])
    * and documented in SURVEY §9.12.
    *
    * All `bands` band keys come from ONE pass over sig: band index and
    * band value pack into a single long key (index in the top bits —
    * band values are < 2^bandBits ≤ 2^20), exploded from an array, so
    * candidate discovery is one explode + one equi-join shuffle, the
    * same shape as [[minhashLsh]].
    */
  private[graft] def simhashPairsBanded(s: SparkSession, d: String, cap: Int,
      bandBits: Int, maxHamming: Int): DataFrame = {
    val nBands = 60 / bandBits
    require(nBands * bandBits == 60, s"bandBits must divide 60 (got $bandBits)")
    require(bandBits <= 20, s"band index packs above bit 60; bandBits <= 20 (got $bandBits)")
    require(maxHamming <= nBands - 1,
      s"pigeonhole covers hamming <= ${nBands - 1} at $nBands bands (asked $maxHamming)")
    val sig = simhashSig(s, d).localCheckpoint()
    simhashBandCands(sig, cap, bandBits)
      .join(sig.select(col("doc_id").as("doc_a"), col("simhash").as("ha")), "doc_a")
      .join(sig.select(col("doc_id").as("doc_b"), col("simhash").as("hb")), "doc_b")
      .withColumn("hamming", expr("bit_count(ha ^ hb)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Banded candidate discovery over a materialized signature frame:
    * one explode + one equi-join shuffle (the [[minhashLsh]] shape). */
  private def simhashBandCands(sig: DataFrame, cap: Int, bandBits: Int): DataFrame = {
    val nBands = 60 / bandBits
    val mask = (1L << bandBits) - 1
    val bandKeys = (0 until nBands).map { b =>
      expr(s"shiftleft(${b}L, 60) | (shiftright(simhash, ${b * bandBits}) & $mask)")
    }
    val bands = capHotBands(
      sig.select(col("doc_id"), explode(array(bandKeys: _*)).as("band_key")),
      cap, "band_key")
    bands.as("x").join(bands.as("y"),
        col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b"))
      .distinct()
  }

  /** Candidate-pair count for one band setting — the measurement body
    * behind [[graft.BandKnee]] (pre-verify volume is the cost driver;
    * the verified pair set is setting-invariant by pigeonhole). */
  private[graft] def simhashCandidateCount(s: SparkSession, d: String,
      cap: Int, bandBits: Int): Long =
    simhashBandCands(simhashSig(s, d).localCheckpoint(), cap, bandBits).count()

  /** DuckDB mirror of [[simhashSig]] (ends with CTE `sig`). */
  private val simhashSqlCte =
    """tok AS (SELECT doc_id, unnest(string_split(text,' ')) AS t FROM documents),
      |tf AS (SELECT doc_id, t, COUNT(*) AS c FROM tok GROUP BY 1, 2),
      |h AS (SELECT doc_id, c, ('0x' || substr(md5(t),1,15))::BIGINT AS hv FROM tf),
      |bits AS (SELECT doc_id, b, SUM(CASE WHEN (hv >> b) & 1 = 1 THEN c ELSE -c END) AS vote
      |         FROM h CROSS JOIN (SELECT unnest(generate_series(0, 59)) AS b) GROUP BY 1, 2),
      |sig AS (SELECT doc_id, CAST(SUM(CASE WHEN vote > 0 THEN (1::BIGINT << b) ELSE 0 END) AS BIGINT) AS simhash
      |        FROM bits GROUP BY doc_id)""".stripMargin

  /** Ground-truth delta-vs-corpus best-match CTEs (ends with `best`:
    * doc_id → dup_of/jaccard/rn, rn=1 is the best corpus match at
    * J ≥ threshold) — shared by the two incremental near-dup gates and
    * [[CorpusClean]]'s incremental pipeline oracle. */
  private[queries] lazy val incrBestCtes: String =
    s"""$jaccardCtes,
       |m AS (SELECT CASE WHEN doc_a % 10 = 0 THEN doc_a ELSE doc_b END AS doc_id,
       |             CASE WHEN doc_a % 10 = 0 THEN doc_b ELSE doc_a END AS dup_of,
       |             jaccard
       |      FROM j
       |      WHERE jaccard >= $JaccardThreshold
       |        AND ((doc_a % 10 = 0) <> (doc_b % 10 = 0))),
       |best AS (SELECT doc_id, dup_of, jaccard,
       |           ROW_NUMBER() OVER (PARTITION BY doc_id
       |                              ORDER BY jaccard DESC, dup_of) AS rn
       |         FROM m)""".stripMargin

  /** DuckDB mirror of the incremental near-dup contract, shared by
    * the self-contained gate, the [[MinhashIndex]]-probe gate, and the
    * streaming probe gate (`st_incr_neardup`, [[StreamQ]]). */
  private[queries] lazy val incrNearDupSql: String =
    s"""WITH $incrBestCtes
       |SELECT d.doc_id, b.dup_of, b.jaccard, b.dup_of IS NULL AS is_new
       |FROM (SELECT doc_id FROM documents WHERE doc_id % 10 = 0) d
       |LEFT JOIN best b ON d.doc_id = b.doc_id AND b.rn = 1
       |ORDER BY d.doc_id""".stripMargin

  /** Recursive min-label closure over the ground-truth pair set (ends
    * with CTE `cl`: doc_id → cluster_id) — shared by the clustering
    * gate and the keep-best selection gate. */
  private lazy val closureCtes: String =
    s"""$jaccardCtes,
       |jp AS (SELECT doc_a, doc_b FROM j WHERE jaccard >= $JaccardThreshold),
       |e AS (SELECT doc_a AS src, doc_b AS dst FROM jp
       |      UNION ALL SELECT doc_b, doc_a FROM jp),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, reach.r FROM reach JOIN e ON reach.v = e.src),
       |cl AS (SELECT v AS doc_id, MIN(r) AS cluster_id FROM reach GROUP BY v)""".stripMargin

  def oracles: Map[String, String] = Map(
    "d_exact_dedup" ->
      """SELECT doc_id, content_hash,
        |  ROW_NUMBER() OVER (PARTITION BY content_hash ORDER BY doc_id) = 1 AS is_keeper
        |FROM (SELECT doc_id,
        |        md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_hash
        |      FROM documents)
        |ORDER BY doc_id""".stripMargin,
    "d_ngram_jaccard" -> (jaccardPairsSql + "\nORDER BY doc_a, doc_b"),
    "d_minhash_lsh" -> (jaccardPairsSql + "\nORDER BY doc_a, doc_b"),
    // All-pairs delta×corpus ground truth: the mixed-parity pairs of
    // the exact Jaccard CTE, best match per delta doc, left-joined back
    // so unduplicated delta docs surface as is_new.
    "d_incr_neardup" -> incrNearDupSql,
    // The indexed variant has IDENTICAL semantics - one oracle.
    "d_incr_indexed" -> incrNearDupSql,
    // Embedding twin: replay the 4-rotation multiprobe bands over ALL
    // vectors, keep mixed-parity collisions oriented delta→corpus,
    // verify exact cosine, best match per delta vector (cosine desc,
    // ties to smallest corpus vec_id) — the incrNearDupSql shape on
    // the embedding family. Candidates come from band collisions on
    // BOTH engines, so LSH's partial recall cancels out exactly.
    "d_embed_incr_indexed" ->
      s"""WITH $embedIncrBestCtes
         |SELECT d.vec_id, b.dup_of, b.cosine, b.dup_of IS NULL AS is_new
         |FROM (SELECT vec_id FROM embeddings WHERE vec_id % 10 = 0) d
         |LEFT JOIN ebest b ON d.vec_id = b.vec_id AND b.rn = 1
         |ORDER BY d.vec_id""".stripMargin,
    // Transitive closure over the ground-truth pair set: reach(v, r)
    // floods every component member's id through the symmetric edge
    // list (UNION = distinct → terminates); MIN(r) per node is the
    // component id — exactly what min-label propagation converges to.
    "d_neardup_clusters" ->
      s"""WITH RECURSIVE $closureCtes
         |SELECT doc_id, cluster_id, cluster_id = doc_id AS is_canonical
         |FROM cl ORDER BY doc_id""".stripMargin,
    // Same closure, then the keep-best window pick per cluster.
    "d_cluster_keep_best" ->
      s"""WITH RECURSIVE $closureCtes
         |SELECT doc_id, cluster_id, n_chars, cluster_size FROM (
         |  SELECT c.doc_id, c.cluster_id, d.n_chars,
         |    COUNT(*) OVER (PARTITION BY c.cluster_id) AS cluster_size,
         |    ROW_NUMBER() OVER (PARTITION BY c.cluster_id
         |                       ORDER BY d.n_chars DESC, c.doc_id) AS rk
         |  FROM cl c JOIN documents d USING (doc_id))
         |WHERE rk = 1 ORDER BY doc_id""".stripMargin,
    "d_simhash" ->
      s"""WITH $simhashSqlCte
         |SELECT doc_id, simhash FROM sig ORDER BY doc_id""".stripMargin,
    // The oracle verifies the PAIR SET by definition (all-pairs hamming
    // at test scale); the Spark side must find the identical set via
    // banding — which pigeonhole guarantees at distance ≤ 3.
    "d_simhash_pairs" ->
      s"""WITH $simhashSqlCte
         |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM sig a JOIN sig b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc_a, doc_b""".stripMargin,
    "d_embed_neardup" ->
      s"""WITH $embNormCte,
         |p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
         |        ${embDotSql("a.v", "b.v")} AS cosine
         |      FROM e a JOIN e b ON a.vec_id < b.vec_id)
         |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,
    "d_embed_lsh_pairs" ->
      s"""WITH $embLshCtes
         |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,
    // Multi-probe: same pipeline with the 4 rotated band tilings —
    // the oracle replays the exact affine index permutations.
    "d_embed_lsh_multiprobe" ->
      s"""WITH $embNormCte,
         |u AS (${(for {
             r <- 0 until 4
             g <- 0 until 8
           } yield {
             val (a, b) = EmbedRotations(r)
             val bits = (0 until 8)
               .map(bb => s"(CASE WHEN v[${(a * (g * 8 + bb) + b) % 64 + 1}] > 0 THEN ${1 << bb} ELSE 0 END)")
               .mkString(" + ")
             s"SELECT vec_id, $r AS rot, $g AS band, $bits AS key FROM e"
           }).mkString("\n      UNION ALL\n      ")}),
         |c AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
         |      FROM u x JOIN u y
         |        ON x.rot = y.rot AND x.band = y.band AND x.key = y.key
         |       AND x.vec_id < y.vec_id),
         |p AS (SELECT vec_a, vec_b, ${embDotSql("a.v", "b.v")} AS cosine
         |      FROM c JOIN e a ON c.vec_a = a.vec_id JOIN e b ON c.vec_b = b.vec_id)
         |SELECT vec_a, vec_b, cosine FROM p WHERE cosine >= 0.45
         |ORDER BY vec_a, vec_b""".stripMargin,
    // Closure over the LSH-discovered pair set (both engines compute
    // the same bands, so the edge list is deterministic on each side).
    "d_embed_clusters" ->
      s"""WITH RECURSIVE $embLshCtes,
         |pp AS (SELECT vec_a, vec_b FROM p WHERE cosine >= 0.45),
         |ed AS (SELECT vec_a AS src, vec_b AS dst FROM pp
         |       UNION ALL SELECT vec_b, vec_a FROM pp),
         |reach(v, r) AS (
         |  SELECT vec_id, vec_id FROM embeddings
         |  UNION
         |  SELECT ed.dst, reach.r FROM reach JOIN ed ON reach.v = ed.src)
         |SELECT v AS vec_id, MIN(r) AS cluster_id, MIN(r) = v AS is_canonical
         |FROM reach GROUP BY v ORDER BY vec_id""".stripMargin
  )

  /** Delta-vs-corpus EMBEDDING best-match CTE chain (ends with
    * `ebest`: vec_id → dup_of/cosine/rn, rn=1 is the best corpus match
    * among 4-rotation multiprobe band collisions at cosine ≥ 0.45) —
    * the [[incrBestCtes]] shape on the embedding family, shared by the
    * `d_embed_incr_indexed` gate and [[CorpusClean]]'s embed-stage
    * ledger oracle. Candidates come from band collisions on BOTH
    * engines, so LSH's partial recall cancels out exactly. */
  private[queries] lazy val embedIncrBestCtes: String =
    s"""$embNormCte,
       |eu AS MATERIALIZED ($embMultiprobeUnionSql),
       |ec AS (SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS dup_of
       |      FROM eu x JOIN eu y
       |        ON x.rot = y.rot AND x.band = y.band AND x.key = y.key
       |       AND x.vec_id % 10 = 0 AND y.vec_id % 10 <> 0),
       |ep AS (SELECT ec.vec_id, ec.dup_of, ${embDotSql("a.v", "b.v")} AS cosine
       |      FROM ec JOIN e a ON ec.vec_id = a.vec_id JOIN e b ON ec.dup_of = b.vec_id),
       |ebest AS (SELECT vec_id, dup_of, cosine,
       |           ROW_NUMBER() OVER (PARTITION BY vec_id
       |                              ORDER BY cosine DESC, dup_of) AS rn
       |         FROM ep WHERE cosine >= $EmbedCosineThreshold)""".stripMargin

  /** The gate-geometry (8-bit × 4-rotation) multiprobe key union over
    * the normalized-vector CTE `e` — the shared SELECT body of the
    * `eu` CTE in [[embedIncrBestCtes]] and [[embedEvolvePairCtes]]. */
  private lazy val embMultiprobeUnionSql: String = (for {
    r <- 0 until 4
    g <- 0 until 8
  } yield {
    val (a, b) = EmbedRotations(r)
    val bits = (0 until 8)
      .map(bb => s"(CASE WHEN v[${(a * (g * 8 + bb) + b) % 64 + 1}] > 0 THEN ${1 << bb} ELSE 0 END)")
      .mkString(" + ")
    s"SELECT vec_id, $r AS rot, $g AS band, $bits AS key FROM e"
  }).mkString("\n      UNION ALL\n      ")

  /** Delta-vs-ANY symmetric embedding pair CTE chain (ends with
    * `ejpairs`: vec_id → dup_of/cosine, every 4-rotation multiprobe
    * band collision at cosine ≥ 0.45 whose left side is a delta vector
    * — the candidate side is UNRESTRICTED, unlike
    * [[embedIncrBestCtes]]'s corpus-only `ec`). [[CorpusClean]]'s
    * K-batch evolving oracle restricts the candidate side per batch to
    * its idx{b} closure in its own chained CTEs (a kept earlier-batch
    * delta doc is a legitimate match there, so the corpus-parity
    * restriction cannot be baked in here). */
  private[queries] lazy val embedEvolvePairCtes: String =
    s"""$embNormCte,
       |eu AS MATERIALIZED ($embMultiprobeUnionSql),
       |ejc AS (SELECT DISTINCT x.vec_id AS vec_id, y.vec_id AS dup_of
       |      FROM eu x JOIN eu y
       |        ON x.rot = y.rot AND x.band = y.band AND x.key = y.key
       |       AND x.vec_id % 10 = 0 AND x.vec_id <> y.vec_id),
       |ejp0 AS (SELECT ejc.vec_id, ejc.dup_of, ${embDotSql("a.v", "b.v")} AS cosine
       |      FROM ejc JOIN e a ON ejc.vec_id = a.vec_id JOIN e b ON ejc.dup_of = b.vec_id),
       |ejpairs AS MATERIALIZED (SELECT vec_id, dup_of, cosine FROM ejp0
       |           WHERE cosine >= $EmbedCosineThreshold)""".stripMargin

  /** Banded-LSH pair CTE chain (ends with CTE `p` carrying
    * vec_a/vec_b/cosine), shared by the pair oracle and the embedding
    * clustering oracle. */
  private lazy val embLshCtes =
    s"""$embNormCte,
       |u AS MATERIALIZED (${(0 until 8).map(g =>
           s"SELECT vec_id, $g AS band, ${embBandSql(g * 8)} AS key FROM e")
           .mkString("\n      UNION ALL\n      ")}),
       |c AS (SELECT DISTINCT x.vec_id AS vec_a, y.vec_id AS vec_b
       |      FROM u x JOIN u y
       |        ON x.band = y.band AND x.key = y.key AND x.vec_id < y.vec_id),
       |p AS (SELECT vec_a, vec_b, ${embDotSql("a.v", "b.v")} AS cosine
       |      FROM c JOIN e a ON c.vec_a = a.vec_id JOIN e b ON c.vec_b = b.vec_id)""".stripMargin

  /** Shared DuckDB normalization CTE for the embedding pair oracles
    * (identical fp order to [[normalizedVecs]]). */
  private val embNormCte =
    """e0 AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v0 FROM embeddings),
      |e AS MATERIALIZED (SELECT vec_id,
      |        list_transform(v0, x -> x / sqrt(
      |          list_reduce(list_prepend(0.0::DOUBLE,
      |            list_transform(generate_series(1, 64), i -> v0[i] * v0[i])),
      |            (p,q) -> p + q))) AS v
      |      FROM e0)""".stripMargin

  /** Left-to-right dot fold (mirrors graft_dot). */
  private def embDotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(0.0::DOUBLE,
       |          list_transform(generate_series(1, 64), i -> $a[i] * $b[i])),
       |          (x,y) -> x + y)""".stripMargin

  /** 8 sign bits of dims lo+1..lo+8 (mirrors the Spark bandKey). */
  private def embBandSql(lo: Int): String =
    (0 until 8).map(b => s"(CASE WHEN v[${lo + b + 1}] > 0 THEN ${1 << b} ELSE 0 END)")
      .mkString(" + ")
}
