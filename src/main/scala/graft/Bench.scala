package graft
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark, following the reference's statistical protocol
  * (`/root/reference/benchmarks/run.py:43-105`): one untimed warmup per
  * query (JIT + codegen + file-listing caches), then up to
  * [[Bench.Rounds]] timed rounds with linear-interpolated P50/P95 —
  * single-pass numbers can't be told apart from run-to-run variance.
  * A per-query time cap (30 s, min 3 rounds) keeps the heavy dedup
  * queries from starving the rest of the suite; the JSON reports the
  * rounds actually used.
  *
  * Output: ONE JSON line (the final stdout line) with `queries` = P50
  * seconds per query (the driver's historical shape) plus `p95` and
  * `rounds` maps — ALSO written verbatim to `SPARK_GRAFT_BENCH_OUT`
  * (default `bench_out.json` in the working directory) so the record
  * survives log-tail truncation.
  */
object Bench {
  val Rounds: Int = sys.env.getOrElse("SPARK_GRAFT_BENCH_ROUNDS", "10").toInt
  val PerQueryCapSec: Double =
    sys.env.getOrElse("SPARK_GRAFT_BENCH_CAP_SEC", "30").toDouble
  val MinRounds = 3

  /** numpy-style linear-interpolated percentile (run.py:57-61). */
  def percentile(xs: Seq[Double], pct: Double): Double = {
    val s = xs.sorted
    val k = (s.length - 1) * pct / 100.0
    val lo = k.toInt
    val hi = math.min(lo + 1, s.length - 1)
    s(lo) + (s(hi) - s(lo)) * (k - lo)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val outPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Optional comma-separated query filter for local iteration
    // (e.g. SPARK_GRAFT_BENCH_ONLY=v_quantize,t_token_stats), and an
    // exclude list for scale rehearsals (the two documented O(n²)
    // oracle-only verifiers must not run at ×10/×64 data —
    // SPARK_GRAFT_BENCH_SKIP=d_ngram_jaccard,d_embed_neardup).
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val skip = sys.env.get("SPARK_GRAFT_BENCH_SKIP")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
      .getOrElse(Set.empty[String])
    val results = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(_.contains(name)) && !skip(name) }
      .map { case (name, fn) =>
      // Full materialization via the compiled physical plan — NOT
      // df.count(): under count() Catalyst prunes every unused
      // computed column, drops sorts, and eliminates 1:1 left joins,
      // so ledger/projection-shaped queries measured a fraction of
      // their real work (round-5 finding: pipe_corpus_clean 14.7×
      // under-measured, q1 3×, v_quantize 2×). toRdd executes the
      // same plan Verify's parquet write runs, minus sink IO.
      def once(): Double = {
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).queryExecution.toRdd.count() }
        catch { case _: Throwable => () }
        (System.nanoTime() - t0) / 1e9
      }
      // Streaming queries are stateful per run; their first run IS
      // representative, so they skip the untimed warmup.
      if (!name.startsWith("st_")) once()
      val times = scala.collection.mutable.ArrayBuffer.empty[Double]
      var spent = 0.0
      while (times.length < Rounds &&
          (times.length < MinRounds || spent < PerQueryCapSec)) {
        val t = once()
        times += t
        spent += t
      }
      // Per-query isolation: each bench round creates fresh
      // localCheckpoint blocks that nothing references once the round
      // ends; left alone they pile up in the block manager and tax the
      // queries that HAPPEN to run later (measured: q5_star_join p50
      // 0.6→1.8 s when benched after the checkpoint-heavy dedup
      // family). A GC cycle lets the ContextCleaner reap exactly the
      // orphans — frames still referenced by long-lived index caches
      // (PostingsIndex.termDf, IvfIndex centroids) survive, so
      // cross-query index reuse keeps working.
      System.gc()
      Thread.sleep(200)
      name -> times.toSeq
    }

    def fmt(v: Double): String = f"$v%.6f"
    def jmap(sel: Seq[Double] => String): String =
      results.map { case (k, ts) => "\"" + k + "\":" + sel(ts) }.mkString("{", ",", "}")
    val p50s = jmap(ts => fmt(percentile(ts, 50)))
    val p95s = jmap(ts => fmt(percentile(ts, 95)))
    val roundsUsed = jmap(ts => ts.length.toString)
    val total = results.map { case (_, ts) => percentile(ts, 50) }.sum
    // A non-empty skip set shrinks the summed total, so it must be
    // part of the record — a skipped run's total is otherwise
    // indistinguishable from (and incomparable with) a full run's.
    val skippedJson =
      if (skip.isEmpty) ""
      else skip.toSeq.sorted.map("\"" + _ + "\"").mkString(""","skipped":[""", ",", "]")
    val json = s"""{"metric":"total","value":${fmt(total)},"unit":"sec","queries":$p50s,""" +
      s""""p95":$p95s,"rounds":$roundsUsed,""" +
      s""""protocol":"p50 of <=$Rounds rounds, warm, full materialization (toRdd), ${PerQueryCapSec.toInt}s/query cap, per-query gc isolation, local[$cpus], heap ${Runtime.getRuntime.maxMemory() >> 30}g"$skippedJson,"sf":"$sfDir"}"""
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] write $outPath failed: $e") }
    println(json)
    // The driver tail-parses a bounded slice of the run log; the full
    // line above (~95 query entries) overflows that window and has
    // recorded as parsed:null since r5. Re-emit the headline numbers as
    // a LAST, short stdout line that always fits the tail — per-query
    // data stays in the full line above and in outPath.
    println(s"""{"metric":"total","value":${fmt(total)},"unit":"sec","n_queries":${results.length},""" +
      s""""detail":"$outPath"$skippedJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
