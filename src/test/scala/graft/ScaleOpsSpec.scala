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
}
