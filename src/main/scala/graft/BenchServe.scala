package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.api.Engine
import graft.util.GenManifest

/** Serving-tier benchmark — pins the BASELINE.md comparison in a
  * committed artifact instead of PerfSpec prose. Same workload as the
  * reference's published numbers (warm serving latencies on a
  * ~500-model project, `/root/reference/benchmarks/run.py:16-41`,
  * BASELINE.md): index rebuild, then warm search / lineage / capsule
  * p50 over repeated calls on one JVM.
  *
  * Output: ONE JSON line, also written to `SPARK_GRAFT_SERVE_OUT`
  * (default `BENCH_SERVE.json`), with measured values, the baseline
  * targets, and the ratio.
  */
object BenchServe {

  private def timeMs[A](body: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val r = body
    (r, (System.nanoTime() - t0) / 1e6)
  }

  private def p50(xs: Seq[Double]): Double = Bench.percentile(xs, 50)

  def main(args: Array[String]): Unit = {
    val outPath = sys.env.getOrElse("SPARK_GRAFT_SERVE_OUT", "BENCH_SERVE.json")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Cold-JVM warmup (codegen + classloading) on a small project so the
    // measured 500-model rebuild is the steady-state cost, matching the
    // reference protocol's warm serving process.
    Engine.fromManifest(spark, GenManifest.write(50)).getProjectStats().collect()

    val path500 = GenManifest.write(500)
    val rebuildTimes = (1 to 5).map { _ =>
      timeMs(Engine.fromManifest(spark, path500).getProjectStats().collect())._2
    }
    val engine = Engine.fromManifest(spark, path500)
    require(engine.getProjectStats().collect().head.getAs[Long]("models") == 500L)

    // 10 unmeasured iterations first: one warm call is not enough for
    // C2 to compile the hot paths, and a half-JIT'd p50 overstates the
    // steady state this artifact exists to pin (observed 2-3x swings).
    def warmRounds(n: Int)(body: => Unit): Seq[Double] = {
      (1 to 10).foreach(_ => body)
      (1 to n).map(_ => timeMs(body)._2)
    }
    val searchMs = warmRounds(20)(engine.searchModels("metric model", limit = 10).collect())
    val lineageMs = warmRounds(20)(engine.getLineage("model.gen.m_250", 3, 3).collect())
    val capsuleMs = warmRounds(20)(
      engine.getContextCapsule("debug metric model", focusModel = Some("fct_model_499")))
    // BASELINE.md row 5: pattern extraction (get_stats + get_patterns
    // workload, run.py:146-153) — target P95 < 200 ms. Served from the
    // snapshot tier like every other interactive call (the distributed
    // Patterns formulations are gate-checked separately).
    val patternsMs = warmRounds(20)(engine.getPatternsSummary())

    // The MCP framing (`serve --mcp`, round 8) must not tax the
    // latency targets: the same three tools through McpServer.handle —
    // full JSON-RPC parse + dispatch + row render per call, the
    // whole per-request path a connected MCP client pays.
    def mcpLine(tool: String, args: String) =
      s"""{"jsonrpc":"2.0","id":1,"method":"tools/call","params":{"name":"$tool","arguments":$args}}"""
    val mcpSearchMs = warmRounds(20)(graft.serve.McpServer.handle(engine,
      mcpLine("search_models", """{"query":"metric model","limit":10}""")))
    val mcpLineageMs = warmRounds(20)(graft.serve.McpServer.handle(engine,
      mcpLine("get_lineage", """{"model_id":"model.gen.m_250"}""")))
    val mcpCapsuleMs = warmRounds(20)(graft.serve.McpServer.handle(engine,
      mcpLine("get_context_capsule", """{"task":"debug metric model","focus_model":"fct_model_499"}""")))

    // Token reduction vs the naive dump-every-model estimate, both as
    // chars/4 (README.md:140 claims 50-65%; run.py:155-196).
    val cap = engine.getContextCapsule("debug metric model", focusModel = Some("fct_model_499"))
    val snap = engine.catalog.snapshot
    val naiveTokens = snap.models.map(m => graft.util.Json.estimateTokens(Map(
      "unique_id" -> m.uniqueId, "name" -> m.name, "sql" -> m.sqlText,
      "description" -> m.description,
      "columns" -> snap.columnsByModel.getOrElse(m.uniqueId, Vector.empty).map(_.name)))).sum
    val reduction = 1.0 - cap.tokenEstimate.toDouble / naiveTokens

    // 10k-model workload — the TOP of the reference's stated envelope
    // (200-10,000+ models, /root/reference/README.md:13). Same protocol;
    // 3 rebuild rounds (each is a full 10k ingest) and the same 20 warm
    // tool rounds. Targets are identical — the reference publishes ONE
    // set of serving targets for the whole envelope — with the
    // BASELINE.json 2x allowance available at this end of it.
    val path10k = GenManifest.write(10000)
    val rebuild10k = (1 to 3).map { _ =>
      timeMs(Engine.fromManifest(spark, path10k).getProjectStats().collect())._2
    }
    val engine10k = Engine.fromManifest(spark, path10k)
    require(engine10k.getProjectStats().collect().head.getAs[Long]("models") == 10000L)
    val search10kMs = warmRounds(20)(engine10k.searchModels("metric model", limit = 10).collect())
    val lineage10kMs = warmRounds(20)(engine10k.getLineage("model.gen.m_5000", 3, 3).collect())
    val capsule10kMs = warmRounds(20)(
      engine10k.getContextCapsule("debug metric model", focusModel = Some("fct_model_9999")))
    val cap10k = engine10k.getContextCapsule("debug metric model", focusModel = Some("fct_model_9999"))
    val snap10k = engine10k.catalog.snapshot
    val naive10k = snap10k.models.map(m => graft.util.Json.estimateTokens(Map(
      "unique_id" -> m.uniqueId, "name" -> m.name, "sql" -> m.sqlText,
      "description" -> m.description,
      "columns" -> snap10k.columnsByModel.getOrElse(m.uniqueId, Vector.empty).map(_.name)))).sum
    val reduction10k = 1.0 - cap10k.tokenEstimate.toDouble / naive10k

    // BASELINE.md targets: rebuild 5 s, search 100 ms, lineage 50 ms,
    // capsule 500 ms (each with a 2x allowance in the driver's check).
    def f(v: Double) = f"$v%.3f"
    val json =
      s"""{"workload":"500-model chained manifest","rounds":{"rebuild":5,"warm":20},""" +
        s""""rebuild_sec":${f(p50(rebuildTimes) / 1000)},"search_ms":${f(p50(searchMs))},""" +
        s""""lineage_ms":${f(p50(lineageMs))},"capsule_ms":${f(p50(capsuleMs))},""" +
        s""""patterns_ms":${f(p50(patternsMs))},"patterns_p95_ms":${f(Bench.percentile(patternsMs, 95))},""" +
        s""""models_per_sec":${f(500 / (p50(rebuildTimes) / 1000))},""" +
        s""""token_reduction_pct":${f(reduction * 100)},""" +
        s""""mcp":{"search_ms":${f(p50(mcpSearchMs))},"lineage_ms":${f(p50(mcpLineageMs))},""" +
        s""""capsule_ms":${f(p50(mcpCapsuleMs))}},""" +
        s""""targets":{"rebuild_sec":5,"search_ms":100,"lineage_ms":50,"capsule_ms":500,"patterns_p95_ms":200,"token_reduction_pct":50},""" +
        s""""at_10k":{"workload":"10000-model chained manifest","rounds":{"rebuild":3,"warm":20},""" +
        s""""rebuild_sec":${f(p50(rebuild10k) / 1000)},"search_ms":${f(p50(search10kMs))},""" +
        s""""lineage_ms":${f(p50(lineage10kMs))},"capsule_ms":${f(p50(capsule10kMs))},""" +
        s""""token_reduction_pct":${f(reduction10k * 100)}},""" +
        s""""protocol":"p50; rebuild cold-per-round after JVM warmup, tool calls warm, local[$cpus]"}"""
    try Files.writeString(Paths.get(outPath), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench-serve] write $outPath failed: $e") }
    println(json)
    spark.stop()
  }
}
