package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.config.EngineConfig

/** Config-wired entry points for the production scale knobs
  * (`graft.toml [scale]` → [[graft.config.ScaleConfig]]).
  *
  * The oracle-gated queries pin spec-stable literal widths (8-bit
  * embedding bands, 10-bit shards, 8 pack shards) so their DuckDB
  * oracles replay byte-identically; a deployment that needs the
  * production widths calls THESE instead — the width comes from the
  * loaded configuration, never a code edit (r9 VERDICT #8; the r10
  * review caught that the parsed knobs previously had no runtime
  * consumer). ScaleOpsSpec pins each delegation against the directly
  * parameterized call.
  */
object ScaleOps {

  /** Banded embedding near-dup pairs at the configured sign-band width
    * (`[scale] embed_band_bits`). */
  def embedLshPairs(s: SparkSession, d: String, cfg: EngineConfig,
      cap: Int = Dedup.MaxBandSize): DataFrame =
    Dedup.embedLshPairs(s, d, cap, cfg.scale.embedBandBits)

  /** Multi-probe variant at the configured width AND rotation count —
    * the recall knob on top of the width knob (wide bands + rotations
    * is the 100k+ corpus recipe; frontier in `BENCH_embed_bands.json`,
    * SURVEY §9.12). `[scale] embed_rotations`. */
  def embedLshPairsMulti(s: SparkSession, d: String, cfg: EngineConfig,
      cap: Int = Dedup.MaxBandSize): DataFrame =
    Dedup.embedLshPairsMulti(s, d, cap, cfg.scale.embedBandBits,
      cfg.scale.embedRotations)

  /** The embed-stage incremental cleaning ledger at the configured
    * ACTING tier (`[scale] embed_act_cos`, default 0.9 =
    * [[Dedup.EmbedActThreshold]]): the cosine a probe match must reach
    * before the ledger flags `embed_dup`. The gate-pinned ledgers act
    * at the 0.9 default — the tier sign-LSH measurably recalls; a
    * deployment that adds a recall route for a looser tier (e.g. the
    * IVF-assisted `d_embed_neardup_ivf` candidates) can lower it HERE,
    * not by editing the verifier floor. */
  def incrCleanEmbed(s: SparkSession, d: String, cfg: EngineConfig): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val delta = graft.Tables.documents(s, d)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
    val deltaVecs = graft.Tables.embeddings(s, d)
      .filter(pmod(col("vec_id"), lit(10)) === 0)
      .select(col("vec_id"), col("embedding"))
    CorpusClean.incrLedger(s, delta, Dedup.digestIndex(s, d), Dedup.incrIndex(s, d),
      Some((Dedup.embedIndex(s, d), deltaVecs)), cfg.scale.embedActCos)
      .orderBy(col("doc_id"))
  }

  /** Deterministic global training-order shuffle at the configured
    * shard width (`[scale] shard_bits`). */
  def globalShuffle(s: SparkSession, d: String, cfg: EngineConfig): DataFrame =
    TrainPrep.globalShuffle(s, d, cfg.scale.shardBits)

  /** Composed mix → shuffle → pack at the configured shard width. */
  def trainPrep(s: SparkSession, d: String, cfg: EngineConfig): DataFrame =
    TrainPrep.trainPrep(s, d, cfg.scale.shardBits)

  /** Sequence packing at the configured shard count
    * (`[scale] seq_pack_shards`). */
  def seqPack(s: SparkSession, d: String, cfg: EngineConfig): DataFrame =
    TrainPrep.seqPack(s, d, cfg.scale.seqPackShards)
}
