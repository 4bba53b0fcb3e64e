package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.queries.IvfIndex

/** Build-cost pricing for the PQ-equipped shared ANN index (r14
  * VERDICT #5: `pq = true` trains several codebook sets into every
  * shared build/retrain, and the trade was amortized-untimed — this
  * main makes it a committed number). For each corpus dir it builds
  * FRESH caller-owned IVF indexes at the gate geometry under four
  * equipment levels and prints one JSON line (also written to
  * `SPARK_GRAFT_PQCOST_OUT`, default `BENCH_pq_build.json`):
  *
  *   - `pq_none`  — centroids + SQ8 codes only;
  *   - `pq_plain` — + the G16 plain codebooks (the minimum PQ serve);
  *   - `pq_serve` — + G8 wide + OPQ permutation (the production
  *                  serving recall rungs, residual off);
  *   - `pq_all`   — all four sets (the gate-corpus build).
  *
  *   sbt "runMain graft.PqBuildCost target/scale_x64"
  */
object PqBuildCost {

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PqBuildCost <sfDir> [sfDir…]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_PQCOST_OUT", "BENCH_pq_build.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(body: => IvfIndex.Index): Double =
      graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
        val t0 = System.nanoTime()
        val idx = body
        val sec = (System.nanoTime() - t0) / 1e9
        idx.drop()
        sec
      }

    val rows = args.map { d =>
      graft.functions.DotProduct.register(spark)
      val e = Tables.embeddings(spark, d)
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.col("embedding").cast("array<double>").as("v0"))
        .withColumn("nrm", org.apache.spark.sql.functions.sqrt(
          graft.functions.VectorOps.norm2(org.apache.spark.sql.functions.col("v0"))))
        .select(org.apache.spark.sql.functions.col("vec_id"),
          org.apache.spark.sql.functions.transform(
            org.apache.spark.sql.functions.col("v0"),
            x => x / org.apache.spark.sql.functions.col("nrm")).as("v"))
        .localCheckpoint()
      val n = e.count()
      def build(pq: Boolean, r: Boolean, w: Boolean, o: Boolean): Double =
        timed(IvfIndex.fresh(spark, s"pqcost|$d", e, 16, 2, 1000000.0,
          pq, r, w, o))
      // Untimed warmup build: the first build pays JVM/codegen/scan
      // warmup that would otherwise land on whichever row runs first
      // (the first strike read pq_none 12.4 s vs pq_plain 8.2 s —
      // ordering, not cost).
      build(pq = false, r = false, w = false, o = false)
      val none = build(pq = false, r = false, w = false, o = false)
      val plain = build(pq = true, r = false, w = false, o = false)
      val serve = build(pq = true, r = false, w = true, o = true)
      val all = build(pq = true, r = true, w = true, o = true)
      System.err.println(s"[pqcost] $d n=$n none=${f(none)} plain=${f(plain)} " +
        s"serve=${f(serve)} all=${f(all)}")
      s""""$d":{"vectors":$n,"pq_none_sec":${f(none)},""" +
        s""""pq_plain_sec":${f(plain)},"pq_serve_sec":${f(serve)},""" +
        s""""pq_all_sec":${f(all)}}"""
    }
    val json = s"""{"metric":"pq_build_cost","dirs":${rows.mkString("{", ",", "}")}}"""
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[pqcost] write failed: $e") }
    println(json)
    spark.stop()
  }

  private def f(v: Double) = f"$v%.3f"
}
