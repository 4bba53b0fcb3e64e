package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic near-duplicate seeding for the embedding recall
  * knee: the synthetic corpus holds NO pairs above 0.7 cosine at any
  * scale (measured in `BENCH_embed_bands.json`: hi70 = hi90 = 0 of
  * 144 / 16.8k / 696k true pairs), so the DEDUP tier — the ≥ 0.9
  * near-identical pairs a cleaning ledger actually acts on — has no
  * measurable denominator there. This main writes `<outDir>/
  * embeddings.parquet` = the source corpus ∪ one perturbed copy per
  * vector (vec_id + 100000): dims where (vec_id + dim) % 13 == 0 are
  * scaled by −0.15 — ~5 of 64 sign bits flip and the pair's cosine
  * lands ~0.93–0.96, the realistic near-dup regime (same text,
  * re-embedded with jitter). Pointing `graft.EmbedBandKnee` at the
  * seeded dir measures tier recall directly: the ≥ 0.9 tier recalls
  * near-totally at widths whose borderline (0.45–0.7) recall is a few
  * percent, because ~5 flipped bits almost always miss some 16-bit
  * band under 64 rotated tilings.
  *
  *   sbt "runMain graft.NearDupSeed /root/testdata/sf0.1 target/knee_neardup"
  */
object NearDupSeed {

  def main(args: Array[String]): Unit = {
    require(args.length == 2, "usage: NearDupSeed <srcDir> <outDir>")
    val Array(srcDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val src = Tables.embeddings(spark, srcDir)
      .select(col("vec_id"), col("embedding"))
    // Offset clears the source id range even on large corpora (the
    // ×64 corpus has 128k vectors, past a fixed 100k offset).
    val offset = math.max(100000L,
      src.agg(max(col("vec_id"))).collect().head.getLong(0) + 1L)
    val perturbed = src.select(
      (col("vec_id") + lit(offset)).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        when(pmod(col("vec_id") + i, lit(13)) === 0, x * lit(-0.15f))
          .otherwise(x)).as("embedding"))
    src.union(perturbed)
      .repartition(8)
      .write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(outDir, "embeddings.parquet").toString)
    val written = spark.read
      .parquet(java.nio.file.Paths.get(outDir, "embeddings.parquet").toString)
      .count()
    System.err.println(s"[neardup-seed] $srcDir -> $outDir ($written vectors)")
    spark.stop()
  }
}
