package graft

import java.nio.file.Files

import graft.config.Config
import graft.queries.{Dedup, ScaleOps, TrainPrep}

/** The `[scale]` knobs must actually REACH the operators: a loaded
  * `graft.toml` width changes what [[graft.queries.ScaleOps]] computes
  * (the r10 review caught the knobs parsed-but-unread). */
class ScaleOpsSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val cfg16 = {
    val root = Files.createTempDirectory("graft_scale_cfg")
    Files.writeString(root.resolve(Config.ConfigFilename),
      """[scale]
        |embed_band_bits = 16
        |embed_rotations = 8
        |shard_bits = 12
        |seq_pack_shards = 4
        |""".stripMargin)
    Config.load(root)
  }

  private def pairs(df: org.apache.spark.sql.DataFrame) =
    df.select("vec_a", "vec_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("embed_band_bits reaches the sign-band pipeline") {
    val viaCfg = pairs(ScaleOps.embedLshPairs(spark, d, cfg16))
    assert(viaCfg == pairs(Dedup.embedLshPairs(spark, d, Dedup.MaxBandSize, 16)),
      "cfg-wired call ≡ the directly parameterized 16-bit call")
    // 16-bit and 8-bit genuinely differ on this corpus (the knee data:
    // the 3 sf0.001 pairs sit near the cosine floor), so a knob that
    // silently stayed at the default would be caught here.
    assert(viaCfg != pairs(Dedup.embedLshPairs(spark, d, Dedup.MaxBandSize, 8)),
      "the configured width must actually change the computation")
    assert(pairs(ScaleOps.embedLshPairsMulti(spark, d, cfg16)) ==
      pairs(Dedup.embedLshPairsMulti(spark, d, Dedup.MaxBandSize, 16, 8)),
      "configured rotations (8) must reach the multiprobe pipeline")
  }

  test("embed_act_cos reaches the cleaning ledger's acting tier") {
    val root = Files.createTempDirectory("graft_scale_act")
    Files.writeString(root.resolve(Config.ConfigFilename),
      "[scale]\nembed_act_cos = 0.45\n")
    val cfgLoose = Config.load(root)
    assert(cfgLoose.scale.embedActCos == 0.45)
    def verdicts(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "reason").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
    val atDefault = verdicts(ScaleOps.incrCleanEmbed(spark, d,
      Config.load(Files.createTempDirectory("graft_scale_dflt"))))
    // cfg-wired default ≡ the gate-pinned ledger
    assert(atDefault == verdicts(SparkEntry.queries("pipe_incr_clean_embed")(spark, d)))
    // the loosened tier genuinely changes verdicts on this corpus: its
    // delta↔corpus matches are all mid-tier (0.45–0.7 — the knee
    // data), so 0.45 flags embed_dup where the default flags none.
    val atLoose = verdicts(ScaleOps.incrCleanEmbed(spark, d, cfgLoose))
    assert(atLoose.exists(_._2 == "embed_dup") &&
      !atDefault.exists(_._2 == "embed_dup"),
      s"the configured acting tier must change the ledger: $atLoose")
  }

  test("shard_bits and seq_pack_shards reach the training-prep operators") {
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect().toSeq
    assert(rows(ScaleOps.globalShuffle(spark, d, cfg16)) ==
      rows(TrainPrep.globalShuffle(spark, d, shardBits = 12)))
    assert(rows(ScaleOps.trainPrep(spark, d, cfg16)) ==
      rows(TrainPrep.trainPrep(spark, d, shardBits = 12)))
    assert(rows(ScaleOps.seqPack(spark, d, cfg16)) ==
      rows(TrainPrep.seqPack(spark, d, shards = 4)))
  }

  test("ivf_pair_bucket reaches the mid-tier pair route's centroid sizing") {
    import graft.queries.Ann
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    val n = Tables.embeddings(spark, d).count() // 500 on sf0.001
    // Default (0) = the √n rule (= 22 centroids here, NOT the gate's
    // fixed 16 — the gate stays the oracle point, this is the scale
    // entry): cfg-wired ≡ directly parameterized at √n.
    val dflt = Config.fromToml(Map.empty, java.nio.file.Paths.get("."))
    assert(dflt.scale.ivfPairBucket == 0)
    val sqrtN = math.max(16, math.round(math.sqrt(n.toDouble)).toInt)
    assert(rows(ScaleOps.embedNearDupIvf(spark, d, dflt)) ==
      rows(Ann.embedPairsIvfAt(spark, d, sqrtN, probe = 2)),
      "default sizing ≡ the √n rule")
    // bucket = 25 → centroids = max(16, 500/25) = 20 ≠ 16 ≠ 22: the
    // cfg-wired call must equal the directly parameterized call.
    val root = Files.createTempDirectory("graft_scale_ivfpair")
    Files.writeString(root.resolve(Config.ConfigFilename),
      "[scale]\nivf_pair_bucket = 25\n")
    val cfg2 = Config.load(root)
    assert(cfg2.scale.ivfPairBucket == 25)
    assert(rows(ScaleOps.embedNearDupIvf(spark, d, cfg2)) ==
      rows(Ann.embedPairsIvfAt(spark, d, numCentroids = 20, probe = 2)),
      "configured flat-bucket sizing must reach the index build")
  }

  test("the mid-tier discovery feed never changes verdicts and never crosses the acting tier") {
    import org.apache.spark.sql.functions.col
    val cfg = Config.fromToml(Map.empty, java.nio.file.Paths.get("."))
    val base = ScaleOps.incrCleanEmbed(spark, d, cfg)
    val fed = ScaleOps.incrCleanEmbedDiscover(spark, d, cfg)
    // Report-only: the ledger columns are bit-identical with the feed on.
    assert(fed.select(base.columns.map(col): _*).collect().toSeq ==
      base.collect().toSeq,
      "the discovery feed must not move any verdict or score")
    // And every surfaced match sits strictly below the acting tier.
    assert(fed.filter(col("mid_cosine").isNotNull &&
        col("mid_cosine") >= cfg.scale.embedActCos).count() == 0,
      "discovery rows must stay below embed_act_cos")
  }

  test("sq8_cands reaches the SQ8 rerank pool") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(4))).toSeq
    // Default pool (50) ≡ the gate entry.
    val dflt = Config.fromToml(Map.empty, java.nio.file.Paths.get("."))
    assert(dflt.scale.sq8Cands == 50)
    assert(rows(ScaleOps.annSq8(spark, d, dflt)) ==
      rows(SparkEntry.queries("ann_sq8")(spark, d)),
      "cfg-wired call at the default pool ≡ the gate query")
    // A pool of 1 leaves at most ONE candidate per query for the
    // rerank — a knob that silently stayed at 50 would still return
    // 10 ranked rows per query.
    val root = Files.createTempDirectory("graft_scale_sq8")
    Files.writeString(root.resolve(Config.ConfigFilename),
      "[scale]\nsq8_cands = 1\n")
    val cfg1 = Config.load(root)
    assert(cfg1.scale.sq8Cands == 1)
    val perQuery = ScaleOps.annSq8(spark, d, cfg1)
      .groupBy("query_id").count().collect().map(_.getLong(1)).toSeq
    assert(perQuery.nonEmpty && perQuery.forall(_ == 1L),
      s"pool=1 must cap the rerank pool at one candidate per query, got $perQuery")
  }

  test("pq_cands reaches the PQ rerank pool") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSeq
    // Default = wide (G8) at pool 50 ≡ the wide route on the gate
    // cohort; pq_wide = false reproduces the G16 gate exactly.
    val dflt = Config.fromToml(Map.empty, java.nio.file.Paths.get("."))
    assert(dflt.scale.pqCands == 50 && dflt.scale.pqWide)
    assert(rows(ScaleOps.annPq(spark, d, dflt)) ==
      rows(graft.queries.AnnPq.pqTopKFor(spark, d, 50, wide = true)),
      "cfg-wired default ≡ the wide route at the default pool")
    val narrowRoot = Files.createTempDirectory("graft_scale_pqw")
    Files.writeString(narrowRoot.resolve(Config.ConfigFilename),
      "[scale]\npq_wide = false\n")
    assert(rows(ScaleOps.annPq(spark, d, Config.load(narrowRoot))) ==
      rows(SparkEntry.queries("ann_pq")(spark, d)),
      "pq_wide = false at the default pool ≡ the G16 gate query")
    // Pool 1: at most one candidate per query survives to the rerank.
    val root = Files.createTempDirectory("graft_scale_pq")
    Files.writeString(root.resolve(Config.ConfigFilename),
      "[scale]\npq_cands = 1\n")
    val cfg1 = Config.load(root)
    assert(cfg1.scale.pqCands == 1)
    val perQuery = ScaleOps.annPq(spark, d, cfg1)
      .groupBy("query_id").count().collect().map(_.getLong(1)).toSeq
    assert(perQuery.nonEmpty && perQuery.forall(_ == 1L),
      s"pool=1 must cap the PQ rerank pool at one candidate per query, got $perQuery")
  }
}
