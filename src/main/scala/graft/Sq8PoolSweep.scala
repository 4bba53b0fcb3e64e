package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.queries.Ann

/** Recall@10-vs-pool measurement for the SQ8 two-stage ANN
  * (`[scale] sq8_cands`, r12 VERDICT #5): the rerank pool is the
  * memory/recall knob a serving preset sizes — stage 2 touches `pool`
  * float rows per query, so halving the pool halves the float bytes a
  * serving fleet keeps warm, at whatever recall cost this artifact
  * prices. For each corpus dir, TRUE top-10 per query (brute-force
  * float cosine) is compared against the SQ8 route at pool ∈
  * {10, 50, 200}, both flat (whole-corpus code rank — the `ann_sq8`
  * shape) and IVF-composed (bucket-prune first — the `ann_ivf_sq8`
  * production stack, whose recall is additionally capped by the
  * nprobe/centroids prune).
  *
  *   sbt "runMain graft.Sq8PoolSweep /root/testdata/sf0.1 target/scale_x64"
  *
  * One JSON line to stdout and `SPARK_GRAFT_SQ8_OUT` (default
  * `BENCH_sq8.json`). SURVEY §9.13 interprets the rows; the shipped
  * production preset (`examples/graft.toml`) documents the chosen
  * pool.
  */
object Sq8PoolSweep {

  private val K = 10
  private val NumSweepQueries = 100
  private val Pools = Seq(10, 50, 200)

  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Sq8PoolSweep <sfDir> [sfDir…]")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SQ8_OUT", "BENCH_sq8.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def swept[T](body: => T): (T, Double) =
      graft.util.CheckpointHygiene.scoped(spark, blocking = true) {
        val t0 = System.nanoTime()
        val n = body
        (n, (System.nanoTime() - t0) / 1e9)
      }
    def topSet(df: DataFrame): Set[(Long, Long)] =
      df.select(col("query_id"), col("vec_id"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // The sweep queries: the first NumSweepQueries vec_ids — spans the
    // gate cohorts and is deterministic across engines/runs.
    val queryPred = col("vec_id") < NumSweepQueries

    var done = Seq.empty[String]
    def writeOut(dirs: Seq[String]): String = {
      val json = s"""{"k":$K,"queries":$NumSweepQueries,""" +
        s""""pools":[${Pools.mkString(",")}],""" +
        s""""dirs":${dirs.mkString("{", ",", "}")}}"""
      try Files.writeString(Paths.get(outPath), json + "\n")
      catch { case e: Throwable => System.err.println(s"[sq8] write $outPath failed: $e") }
      json
    }

    args.foreach { d =>
      val nVecs = Tables.embeddings(spark, d).count()
      // Index build is untimed and UNscoped (its centroids are live
      // localCheckpoint state the cached handle reads through — the
      // EmbedIvfRecall discipline); every measurement below gets its
      // own scope whose baseline already contains the build's blocks.
      Ann.prebuildIndex(spark, d)
      // Brute-force truth over the SAME persisted normalized vectors
      // the SQ8 route reads, so recall is measured on one geometry.
      val ((truth, truthN), truthSec) = swept {
        graft.functions.DotProduct.register(spark)
        val e = Ann.persistedVecsFor(spark, d)
        val q = e.filter(queryPred)
          .select(col("vec_id").as("query_id"), col("v").as("qv"))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("vec_id"))
        val t = topSet(e.crossJoin(broadcast(q))
          .filter(col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id"), expr("graft_dot(qv, v)").as("cosine"))
          .withColumn("rank", row_number().over(w))
          .filter(col("rank") <= K))
        (t, t.size)
      }
      System.err.println(s"[sq8] $d n=$nVecs truth pairs=$truthN (${f(truthSec)}s)")
      val poolRows = Pools.map { pool =>
        val (flat, flatSec) = swept(
          topSet(Ann.sq8TopKFor(spark, d, pool, prune = false, queryPred)))
        val (ivf, ivfSec) = swept(
          topSet(Ann.sq8TopKFor(spark, d, pool, prune = true, queryPred)))
        // The PQ routes (round 13) priced on the same geometry: stage 1
        // reads 8 stored bytes/vector instead of SQ8's 64 — the recall
        // delta vs SQ8 at each pool is the cost of that 8×. Round 14
        // adds the RESIDUAL route (codes v − centroid at the same 8
        // bytes — the fixed-pool recall answer).
        val (pqFlat, pqFlatSec) = swept(
          topSet(graft.queries.AnnPq.pqTopKFor(spark, d, pool, prune = false,
            queryPred = queryPred)))
        val (pqIvf, pqIvfSec) = swept(
          topSet(graft.queries.AnnPq.pqTopKFor(spark, d, pool, prune = true,
            queryPred = queryPred)))
        val (pqr, pqrSec) = swept(
          topSet(graft.queries.AnnPq.pqTopKFor(spark, d, pool, prune = true,
            residual = true, queryPred = queryPred)))
        val (pqw, pqwSec) = swept(
          topSet(graft.queries.AnnPq.pqTopKFor(spark, d, pool,
            wide = true, queryPred = queryPred)))
        // Round 15: the OPQ-lite rung (energy-balancing permutation at
        // G16 cost) and the pruned wide stack, each priced on the same
        // truth set.
        val (pqo, pqoSec) = swept(
          topSet(graft.queries.AnnPq.pqTopKFor(spark, d, pool,
            opq = true, queryPred = queryPred)))
        val (pqwIvf, pqwIvfSec) = swept(
          topSet(graft.queries.AnnPq.pqTopKFor(spark, d, pool,
            prune = true, wide = true, queryPred = queryPred)))
        val rFlat = (flat & truth).size.toDouble / truthN
        val rIvf = (ivf & truth).size.toDouble / truthN
        val rPq = (pqFlat & truth).size.toDouble / truthN
        val rPqIvf = (pqIvf & truth).size.toDouble / truthN
        val rPqr = (pqr & truth).size.toDouble / truthN
        val rPqw = (pqw & truth).size.toDouble / truthN
        val rPqo = (pqo & truth).size.toDouble / truthN
        val rPqwIvf = (pqwIvf & truth).size.toDouble / truthN
        System.err.println(s"[sq8] $d pool=$pool recall=${f(rFlat)} " +
          s"(${f(flatSec)}s) recall_ivf=${f(rIvf)} (${f(ivfSec)}s) " +
          s"recall_pq=${f(rPq)} (${f(pqFlatSec)}s) recall_ivf_pq=${f(rPqIvf)} (${f(pqIvfSec)}s) " +
          s"recall_ivf_pqr=${f(rPqr)} (${f(pqrSec)}s) recall_pq_w8=${f(rPqw)} (${f(pqwSec)}s) " +
          s"recall_pq_opq=${f(rPqo)} (${f(pqoSec)}s) recall_ivf_pq_w8=${f(rPqwIvf)} (${f(pqwIvfSec)}s)")
        s""""$pool":{"recall":${f(rFlat)},"sec":${f(flatSec)},""" +
          s""""recall_ivf":${f(rIvf)},"sec_ivf":${f(ivfSec)},""" +
          s""""recall_pq":${f(rPq)},"sec_pq":${f(pqFlatSec)},""" +
          s""""recall_ivf_pq":${f(rPqIvf)},"sec_ivf_pq":${f(pqIvfSec)},""" +
          s""""recall_ivf_pqr":${f(rPqr)},"sec_ivf_pqr":${f(pqrSec)},""" +
          s""""recall_pq_w8":${f(rPqw)},"sec_pq_w8":${f(pqwSec)},""" +
          s""""recall_pq_opq":${f(rPqo)},"sec_pq_opq":${f(pqoSec)},""" +
          s""""recall_ivf_pq_w8":${f(rPqwIvf)},"sec_ivf_pq_w8":${f(pqwIvfSec)}}"""
      }.mkString("{", ",", "}")
      done = done :+
        s""""$d":{"vectors":$nVecs,"truth_sec":${f(truthSec)},"by_pool":$poolRows}"""
      writeOut(done)
    }
    println(writeOut(done))
    spark.stop()
  }

  private def f(v: Double) = f"$v%.3f"
}
