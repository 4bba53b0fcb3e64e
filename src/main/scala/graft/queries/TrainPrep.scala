package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.TextHash.h60

/** Training-data preparation operators: sequence packing (the
  * concat-and-chunk step that turns documents into fixed-budget
  * training sequences) and benchmark-contamination detection (n-gram
  * overlap between the corpus and a held-out probe set). Both are
  * window/join-shaped — no driver-side state, no UDFs.
  */
object TrainPrep {

  /** Sequence packing, concat-and-split style: documents are laid out
    * in deterministic order within a shard, the exclusive running
    * token sum locates each document in the token stream, and
    * pack_id / pack_offset are its quotient/remainder by the 2048-
    * token budget — the standard pretraining packing (documents
    * straddling a boundary are split across packs at train time; the
    * assignment here is where each document STARTS).
    *
    * Scale shape: ONE data shuffle, on the shard key, then a per-shard
    * window sort (the trailing global orderBy is presentation for the
    * oracle compare — its range exchange is output-sized). `shards`
    * must scale with the corpus — a fixed 8 would serialize a 100 TB
    * window; production uses ~4k–64k so each shard's token stream fits
    * an executor. The plan shape is shard-count-independent
    * (TrainPrepSpec pins exactly one hash exchange at 8 and at 4096);
    * the gate keeps 8 for oracle stability. The budget arithmetic is
    * integral end-to-end, so both engines agree bit-for-bit. */
  def seqPack(s: SparkSession, d: String, shards: Int = 8): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.documents(s, d)
      .select(col("doc_id"), pmod(col("doc_id"), lit(shards)).as("shard"),
        expr("div(n_chars + 3, 4)").as("tokens"))
      .withColumn("cum_excl", coalesce(sum(col("tokens")).over(w), lit(0L)))
      .select(col("doc_id"), col("shard"), col("tokens"),
        expr("div(cum_excl, 2048)").as("pack_id"),
        (col("cum_excl") % 2048).as("pack_offset"))
      .orderBy(col("doc_id"))
  }

  /** Deterministic global training-order shuffle WITHOUT a global
    * window: the standard "shuffle the corpus once before packing"
    * step. Each doc's shuffle key is its h60 hash; the global
    * position is rank within the key order. A naive row_number()
    * over (ORDER BY key) is a single-partition sort — the classic
    * scale-killer — so this computes it as per-shard rank + shard
    * offset, where shard = the key's top `shardBits` bits: shards
    * partition the key ORDER (k_a < k_b whenever shard_a < shard_b),
    * so offset(shard) + rank-within-shard ≡ the global row_number.
    * The shard ranks ride ONE hash shuffle + per-shard sort; the
    * offsets are a 2^shardBits-row running sum joined back broadcast.
    *
    * `shardBits` must scale with the corpus (the `seqPack(shards)`
    * precedent, r8 VERDICT #3): at the gate's 10 bits a 100 TB corpus
    * would sort ~100 GB per shard — production uses ~16 bits (65k
    * shards, ~1.5 GB per shard-sort), which keeps the offsets table a
    * trivially-broadcast 65k rows and the plan shape IDENTICAL
    * (TrainPrepSpec pins equality and the one-exchange plan at both
    * widths). The gate keeps 10 for oracle stability; the oracle
    * computes the naive global form — the decomposition must equal it
    * exactly at any width. */
  def globalShuffle(s: SparkSession, d: String, shardBits: Int = 10): DataFrame = {
    require(shardBits >= 0 && shardBits <= 40, s"shardBits in [0,40] (got $shardBits)")
    val keyed = Tables.documents(s, d)
      .select(col("doc_id"),
        h60(concat(lit("shuf#"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard", expr(s"shiftright(k, ${60 - shardBits})"))
    val perShard = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    val ranked = keyed.withColumn("rk", row_number().over(perShard))
    // ≤2^shardBits rows: the unpartitioned running-sum window is
    // bounded by the shard-id space, not the corpus — single partition
    // is fine.
    val offW = Window.orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = keyed.groupBy(col("shard")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(sum(col("cnt")).over(offW), lit(0L)))
      .select(col("shard"), col("off"))
    ranked.join(broadcast(offsets), Seq("shard"))
      .select(col("doc_id"), (col("off") + col("rk") - 1).as("pos"))
      .orderBy(col("doc_id"))
  }

  /** End-to-end training-data PREPARATION — the composition that
    * follows cleaning, as ONE declarative plan:
    *
    *   1. domain mixing   (t_domain_mix's token-weighted keep set);
    *   2. global shuffle  ([[globalShuffle]]'s deterministic
    *                       permutation, over the KEPT docs);
    *   3. sequence packing (t_seq_pack's budget arithmetic — but in
    *                       SHUFFLE order, the production semantic:
    *                       "shuffle once, then pack").
    *
    * The scale point of composing them: steps 2 and 3 are BOTH
    * prefix sums over the same (k, doc_id) order, so they share the
    * per-shard decomposition — ONE hash shuffle on the shuffle-key
    * shard carries the rank window AND the cumulative-token window
    * (same partitioning + ordering → Catalyst plans a single
    * exchange+sort), and the ≤2^shardBits-row shard offsets (row count
    * AND token sum) ride one broadcast join back. The corpus is never
    * globally sorted and nothing corpus-sized converges to one
    * partition. Like [[globalShuffle]], the offsets agg re-scans the
    * narrow keyed columns rather than checkpointing the corpus-sized
    * kept frame, and `shardBits` carries the same 100 TB sizing note
    * (gate 10 bits, production ~16). The oracle computes the NAIVE
    * form — mix filter, global ROW_NUMBER, global windowed token sum —
    * and the gate pins the decomposition exactly equal. */
  def trainPrep(s: SparkSession, d: String, shardBits: Int = 10): DataFrame = {
    require(shardBits >= 0 && shardBits <= 40, s"shardBits in [0,40] (got $shardBits)")
    val docs = Tables.documents(s, d)
    // 1. token-weighted mix thresholds (|sources| rows, broadcast)
    val cnts = docs.groupBy(col("source"))
      .agg(sum(expr("div(n_chars + 3, 4)")).as("toks"))
    val minCnt = cnts.agg(min(col("toks")).as("min_toks"))
    val thr = cnts.crossJoin(broadcast(minCnt))
      .select(col("source"), expr("div(1000000 * min_toks, toks)").as("thr"))
    val kept = docs.join(broadcast(thr), Seq("source"))
      .filter(h60(concat(lit("mix#"), col("doc_id").cast("string"))) % 1000000
        < col("thr"))
      .select(col("doc_id"), col("source"), expr("div(n_chars + 3, 4)").as("tokens"),
        h60(concat(lit("shuf#"), col("doc_id").cast("string"))).as("k"))
      .withColumn("shard", expr(s"shiftright(k, ${60 - shardBits})"))
    // 2+3. one shard exchange, two windows over it
    val perShard = Window.partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    val ranked = kept
      .withColumn("rk", row_number().over(perShard))
      .withColumn("cum_shard", coalesce(sum(col("tokens"))
        .over(perShard.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val offW = Window.orderBy(col("shard")).rowsBetween(Window.unboundedPreceding, -1)
    val offsets = kept.groupBy(col("shard"))
      .agg(count(lit(1)).as("cnt"), sum(col("tokens")).as("stoks"))
      .withColumn("off", coalesce(sum(col("cnt")).over(offW), lit(0L)))
      .withColumn("tok_off", coalesce(sum(col("stoks")).over(offW), lit(0L)))
      .select(col("shard"), col("off"), col("tok_off"))
    ranked.join(broadcast(offsets), Seq("shard"))
      .select(col("doc_id"), col("source"), col("tokens"),
        (col("off") + col("rk") - 1).as("pos"),
        expr("div(tok_off + cum_shard, 2048)").as("pack_id"),
        ((col("tok_off") + col("cum_shard")) % 2048).as("pack_offset"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    "t_seq_pack" -> ((s, d) => seqPack(s, d)),

    // Benchmark contamination: which corpus documents share word
    // 4-grams with the probe ("benchmark") set — here the doc_id % 7
    // slice, standing in for an external eval suite. Per-doc overlap =
    // |own distinct 4-grams ∩ probe 4-grams| / |own distinct 4-grams|;
    // ≥ 50% flags the document. N-grams are md5-keyed (portable
    // constant-width join key; production would use xxhash64).
    //
    // Scale shape: the n-gram explode + distinct is the heavy shuffle
    // (same cost class as the MinHash shingle stage). At 100 TB the
    // probe side is a fixed benchmark suite — tiny — so its distinct
    // gram set BROADCASTS and the contamination check is a map-side
    // semi-probe per gram; here probe comes from the same table, so
    // the checkpointed gram frame is built once and consumed by both
    // sides. Spark's sequence(1, n) DESCENDS when n < 1 (DuckDB's
    // generate_series is empty), so short docs take an explicit
    // empty-array branch.
    "t_contamination" -> ((s, d) => {
      // Per-doc distinct gram set is SCAN-LOCAL (round 7): the
      // graft_shingles kernel emits each normalized document's
      // distinct 4-gram xxhash64 array during the scan, so the former
      // explode -> (doc_id, md5-string) distinct shuffle (32-byte
      // strings, the query's dominant stage at x10) disappears;
      // exploded rows are already distinct per doc and 8-byte longs.
      // Gram identity by hash is internal - the oracle compares only
      // per-doc counts/ratios, which agree up to 2^-64 collisions (the
      // code comment's original "production would use xxhash64").
      graft.functions.MinhashSig.register(s)
      val ng = TrainPrep.gramRows(Tables.documents(s, d)).localCheckpoint()
      val probe = ng.filter(pmod(col("doc_id"), lit(7)) === 0)
        .select(col("g")).distinct()
      val corpus = ng.filter(pmod(col("doc_id"), lit(7)) =!= 0)
      val hits = corpus.join(probe, Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_gram"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_gram"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_gram").cast("double"))
            .as("overlap"),
          (coalesce(col("n_hit"), lit(0L)) >= lit(0.5) * col("n_gram")).as("contaminated"))
        .filter(col("n_hit") > 0)
        .orderBy(col("overlap").desc, col("doc_id"))
    }),

    // Two-source form of contamination detection — the 100 TB shape.
    // In production the probe is a fixed benchmark suite (MB, not TB):
    // its distinct gram set is built from its own scan and BROADCAST,
    // so the contamination check against the corpus is a map-side
    // hash-join probe per gram — no shuffle of the corpus gram stream
    // at all beyond the per-doc aggregation. Here both "sources" read
    // the same documents.parquet (the driver provides one sf dir), but
    // the probe side is a SEPARATE bounded scan feeding an explicit
    // broadcast() hint; TrainPrepSpec pins BroadcastHashJoin in the
    // plan. Semantics identical to t_contamination.
    "t_contamination_probe" -> ((s, d) => {
      graft.functions.MinhashSig.register(s)
      val probe = broadcast(
        TrainPrep.gramRows(Tables.documents(s, d).filter(pmod(col("doc_id"), lit(7)) === 0))
          .select(col("g")).distinct())
      val corpus = TrainPrep.gramRows(
        Tables.documents(s, d).filter(pmod(col("doc_id"), lit(7)) =!= 0))
        .localCheckpoint()
      val hits = corpus.join(probe, Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_hit"))
      corpus.groupBy(col("doc_id")).agg(count(lit(1)).as("n_gram"))
        .join(hits, Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("n_hit"), lit(0L)).as("n_hit"), col("n_gram"),
          (coalesce(col("n_hit"), lit(0L)).cast("double") / col("n_gram").cast("double"))
            .as("overlap"),
          (coalesce(col("n_hit"), lit(0L)) >= lit(0.5) * col("n_gram")).as("contaminated"))
        .filter(col("n_hit") > 0)
        .orderBy(col("overlap").desc, col("doc_id"))
    }),

    "t_span_dedup" -> ((s, d) => spanDedup(s, d)),

    // Domain mixture rebalancing: downsample every source to the
    // smallest source's TOKEN budget — the "don't let CommonCrawl
    // drown the books" step of training-mix construction (mixtures
    // are token-weighted, not doc-weighted). Per-source keep
    // thresholds are integral (div(1e6·min_tokens, tokens_s), exact in
    // both engines); membership is the h60 hash-bucket coin, so the
    // sample is reproducible across engines, runs, and partitionings —
    // no RNG, and E[kept tokens] ≈ min_tokens for every source.
    //
    // Scale shape: the source-token agg is |sources| rows (tiny), its
    // min is a 1-row cross join, and the threshold table joins back
    // BROADCAST — the corpus itself is touched by exactly one scan +
    // map-side filter. At 100 TB the rates table is still |sources|
    // rows; nothing here grows with the corpus.
    "t_domain_mix" -> ((s, d) => {
      val docs = Tables.documents(s, d)
      val cnts = docs.groupBy(col("source"))
        .agg(sum(expr("div(n_chars + 3, 4)")).as("toks"))
      val minCnt = cnts.agg(min(col("toks")).as("min_toks"))
      val thr = cnts.crossJoin(broadcast(minCnt))
        .select(col("source"), expr("div(1000000 * min_toks, toks)").as("thr"))
      docs.join(broadcast(thr), Seq("source"))
        .filter(h60(concat(lit("mix#"), col("doc_id").cast("string"))) % 1000000
          < col("thr"))
        .select(col("doc_id"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "t_global_shuffle" -> ((s, d) => globalShuffle(s, d)),

    "pipe_train_prep" -> ((s, d) => trainPrep(s, d)),

    // Sliding-window chunking for retrieval indexing (RAG prep):
    // 32-token chunks at stride 16 — every token is covered, interior
    // tokens twice, so a query phrase never straddles an unseen
    // boundary. Chunk count per doc is max(1, ceil((len-16)/16)); the
    // final chunk may be short. Purely narrow per-row work (transform
    // + posexplode inside the scan projection): scales with the scan,
    // zero shuffles before the presentation sort. Chunk text is keyed
    // by md5 to keep the result (and the oracle compare) narrow.
    "t_chunk_overlap" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("doc_id"), split(col("text"), " ").as("ts"))
        .withColumn("nc",
          greatest(lit(1), ceil((size(col("ts")) - 16) / 16.0).cast("int")))
        .select(col("doc_id"), col("ts"),
          posexplode(expr(
            "transform(sequence(0, nc - 1), i -> array_join(slice(ts, i*16+1, 32), ' '))"))
            .as(Seq("chunk_id", "chunk")))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          least(lit(32), size(col("ts")) - col("chunk_id") * 16).cast("long")
            .as("n_tokens"),
          md5(col("chunk")).as("chunk_md5"))
        .orderBy(col("doc_id"), col("chunk_id")))
  )

  /** Duplicated-chunk hash counts above this ride a broadcast into the
    * removal anti-join; above it the probe falls back to a shuffle
    * anti-join. 4M longs ≈ a few hundred MB of hash relation — well
    * inside a driver/executor at the default 24 g, far outside a
    * "grows with the corpus" failure mode (r7 VERDICT #3: a high-
    * duplication corpus, e.g. the ×64 copy-rehearsal, makes MOST
    * chunks duplicated, and an unguarded broadcast OOMs the driver). */
  val SpanDedupBroadcastMax: Long = 4L * 1000 * 1000

  /** Cross-document span dedup (the C4/RefinedWeb "remove repeated
    * lines/spans across documents" cleaning step, applied at aligned
    * 8-token chunk granularity since this corpus has no sentence
    * punctuation): a chunk whose exact text appears in ≥2 distinct
    * documents is dropped from EVERY document, and each document's
    * text is reconstructed from its kept chunks in order. Documents
    * whose every chunk is shared (verbatim duplicates) vanish.
    *
    * Scale shape: chunking is a narrow per-row transform; the chunk
    * frequency count shuffles xxhash64 LONGS (the strings never leave
    * their scan partition for the agg — the hashedShingles discipline,
    * exact up to 64-bit collisions). The duplicated-span set is
    * USUALLY the small side (shared boilerplate ≪ corpus), so the
    * removal is a BROADCAST anti-join probe per chunk — map-side, no
    * shuffle of the corpus chunk stream — but "usually" is not a size
    * guard: the set is COUNT-GATED (the count is a scalar over the
    * already-shuffled frequency agg), and past `broadcastMax` the
    * removal falls back to a shuffle anti-join on the hash key.
    * TrainPrepSpec pins both physical shapes and their row-for-row
    * equality. Reconstruction is the one by-doc shuffle, with the
    * deterministic sorted-fold concat (collect_list order is
    * shuffle-arrival; array_sort by pos pins it). */
  def spanDedup(s: SparkSession, d: String,
      broadcastMax: Long = SpanDedupBroadcastMax): DataFrame = {
    val ts = split(col("text"), " ")
    val chunkArr = expr("transform(sequence(0, cast(ceil(size(ts) / 8.0) as int) - 1), " +
      "i -> array_join(slice(ts, i*8+1, 8), ' '))")
    val chunks = Tables.documents(s, d)
      .select(col("doc_id"), ts.as("ts"))
      // Spark's sequence DESCENDS when stop < start (an empty text
      // would yield sequence(0,-1) = [0,-1]); DuckDB's
      // generate_series is empty — take the empty branch explicitly.
      .select(col("doc_id"), posexplode(when(size(col("ts")) > 0, chunkArr)
        .otherwise(array().cast("array<string>"))).as(Seq("pos", "chunk")))
      .withColumn("h", xxhash64(col("chunk")))
      .localCheckpoint()
    val dup = chunks.groupBy(col("h"))
      .agg(countDistinct(col("doc_id")).as("ndocs"))
      .filter(col("ndocs") >= 2).select(col("h"))
      .localCheckpoint(false)
    val nDup = dup.count()
    // shuffle_hash (not merge): the anti-probe needs no order, and
    // hashing the dup side per partition beats sorting the corpus-
    // sized chunk stream. The hint pins the strategy so neither the
    // planner's propagated origin stats nor AQE re-broadcast a frame
    // the gate decided is too big.
    val removed =
      if (nDup <= broadcastMax) chunks.join(broadcast(dup), Seq("h"), "left_anti")
      else chunks.join(dup.hint("shuffle_hash"), Seq("h"), "left_anti")
    removed
      .groupBy(col("doc_id"))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("chunk")))),
          x => x.getField("chunk")), " ").as("cleaned_text"),
        count(lit(1)).as("n_kept"))
      .orderBy(col("doc_id"))
  }

  /** (doc_id, g) rows of each document's DISTINCT normalized word
    * 4-grams, hashed — one scan-local `graft_shingles` pass per doc
    * (register `MinhashSig` first); docs with <4 tokens contribute no
    * rows, exactly as the exploded formulations had it (empty gram
    * array there, null array here). */
  private def gramRows(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "[^a-z0-9]+", " ")).as("norm"))
      .select(col("doc_id"), expr("graft_shingles(norm, 4)").as("gs"))
      .filter(col("gs").isNotNull)
      .select(col("doc_id"), explode(col("gs")).as("g"))

  /** One definition for both contamination gates — they share
    * semantics exactly; only the Spark-side physical shape differs. */
  private val contaminationOracleSql: String =
    """WITH tok AS (
      |  SELECT doc_id,
      |    string_split_regex(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')), ' ') AS ts
      |  FROM documents),
      |ng AS (
      |  SELECT DISTINCT doc_id, md5(array_to_string(ts[i:i+3], ' ')) AS g
      |  FROM tok, UNNEST(generate_series(1, greatest(len(ts) - 3, 0))) AS u(i)),
      |probe AS (SELECT DISTINCT g FROM ng WHERE doc_id % 7 = 0),
      |corpus AS (SELECT doc_id, g FROM ng WHERE doc_id % 7 <> 0),
      |hits AS (
      |  SELECT c2.doc_id, COUNT(*) AS n_hit
      |  FROM corpus c2 JOIN probe USING (g) GROUP BY c2.doc_id),
      |tot AS (SELECT doc_id, COUNT(*) AS n_gram FROM corpus GROUP BY doc_id)
      |SELECT t.doc_id, COALESCE(n_hit, 0) AS n_hit, n_gram,
      |  CAST(COALESCE(n_hit, 0) AS DOUBLE) / n_gram AS overlap,
      |  COALESCE(n_hit, 0) >= 0.5 * n_gram AS contaminated
      |FROM tot t LEFT JOIN hits USING (doc_id)
      |WHERE COALESCE(n_hit, 0) > 0
      |ORDER BY overlap DESC, t.doc_id""".stripMargin

  def oracles: Map[String, String] = Map(
    "t_seq_pack" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard, (n_chars + 3) // 4 AS tokens
        |  FROM documents),
        |w AS (
        |  SELECT doc_id, shard, tokens,
        |    CAST(COALESCE(SUM(tokens) OVER (PARTITION BY shard ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
        |  FROM t)
        |SELECT doc_id, shard, tokens, cum_excl // 2048 AS pack_id, cum_excl % 2048 AS pack_offset
        |FROM w ORDER BY doc_id""".stripMargin,
    "t_contamination" -> contaminationOracleSql,
    // Identical semantics (and oracle) as t_contamination — the variant
    // differs only in physical shape (separate probe scan + broadcast
    // join).
    "t_contamination_probe" -> contaminationOracleSql,
    "t_domain_mix" ->
      """WITH c AS (
        |  SELECT source, CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, (1000000 * (SELECT MIN(toks) FROM c)) // toks AS thr FROM c)
        |SELECT doc_id, source FROM documents JOIN r USING (source)
        |WHERE ('0x' || substr(md5('mix#' || doc_id), 1, 15))::BIGINT % 1000000 < thr
        |ORDER BY doc_id""".stripMargin,
    // The NAIVE global form — the Spark side must reproduce it exactly
    // via the per-shard decomposition.
    "t_global_shuffle" ->
      """WITH k AS (
        |  SELECT doc_id,
        |    ('0x' || substr(md5('shuf#' || doc_id), 1, 15))::BIGINT AS k
        |  FROM documents)
        |SELECT doc_id, ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS pos
        |FROM k ORDER BY doc_id""".stripMargin,
    // The NAIVE composed form: mix filter, then one global
    // ROW_NUMBER and one global windowed token sum over the kept set
    // (HUGEINT-cast per the §9.10 oracle-authoring rule).
    "pipe_train_prep" ->
      """WITH c AS (
        |  SELECT source, CAST(SUM((n_chars + 3) // 4) AS BIGINT) AS toks
        |  FROM documents GROUP BY source),
        |r AS (SELECT source, (1000000 * (SELECT MIN(toks) FROM c)) // toks AS thr FROM c),
        |kept AS (
        |  SELECT doc_id, source, (n_chars + 3) // 4 AS tokens,
        |    ('0x' || substr(md5('shuf#' || doc_id), 1, 15))::BIGINT AS k
        |  FROM documents JOIN r USING (source)
        |  WHERE ('0x' || substr(md5('mix#' || doc_id), 1, 15))::BIGINT % 1000000 < thr),
        |w AS (
        |  SELECT doc_id, source, tokens,
        |    ROW_NUMBER() OVER (ORDER BY k, doc_id) - 1 AS pos,
        |    CAST(COALESCE(SUM(tokens) OVER (ORDER BY k, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_excl
        |  FROM kept)
        |SELECT doc_id, source, tokens, pos,
        |  cum_excl // 2048 AS pack_id, cum_excl % 2048 AS pack_offset
        |FROM w ORDER BY doc_id""".stripMargin,
    "t_chunk_overlap" ->
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
        |n AS (SELECT doc_id, ts,
        |        greatest(1, CAST(ceil((len(ts) - 16) / 16.0) AS INT)) AS nc
        |      FROM t),
        |c AS (SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_id,
        |        array_to_string(ts[u.i*16+1 : u.i*16+32], ' ') AS chunk,
        |        CAST(least(32, len(ts) - u.i*16) AS BIGINT) AS n_tokens
        |      FROM n, UNNEST(generate_series(0, nc - 1)) AS u(i))
        |SELECT doc_id, chunk_id, n_tokens, md5(chunk) AS chunk_md5
        |FROM c ORDER BY doc_id, chunk_id""".stripMargin,
    "t_span_dedup" ->
      """WITH c AS (
        |  SELECT doc_id, u.pos AS pos, u.chunk AS chunk FROM (
        |    SELECT doc_id, unnest(list_transform(
        |        generate_series(0, CAST(ceil(len(ts) / 8.0) AS INT) - 1),
        |        i -> {'pos': i, 'chunk': array_to_string(ts[i*8+1 : i*8+8], ' ')})) AS u
        |    FROM (SELECT doc_id, string_split(text, ' ') AS ts FROM documents))),
        |dup AS (
        |  SELECT chunk FROM (
        |    SELECT chunk, COUNT(DISTINCT doc_id) AS ndocs FROM c GROUP BY chunk)
        |  WHERE ndocs >= 2)
        |SELECT doc_id,
        |  string_agg(chunk, ' ' ORDER BY pos) AS cleaned_text,
        |  COUNT(*) AS n_kept
        |FROM c ANTI JOIN dup USING (chunk)
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  )
}
