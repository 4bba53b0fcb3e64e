package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for declared queries to files — the
  * optimization-round evidence trail (`plans/r15/<query>_<tag>.txt`).
  *
  *   sbt "runMain graft.PlanDump <tag> <outDir> [q1,q2,...]"
  *
  * Queries default to every [[SparkEntry.queries]] entry. Loop-shaped
  * pipeline gates (`pipe_incr_evolve*`, `pipe_incr_clean_serve`) return
  * a union of materialized checkpoints, so their top-level plan is
  * scan-of-RDD unions; for those the per-stage plans of interest are
  * dumped by the probe mains instead. Runs on sf0.01 so index builds
  * stay cheap; plan SHAPE (join strategy, exchanges, pushdown) is
  * scale-independent at these sizes.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val tag = if (args.length > 0) args(0) else "before"
    val outDir = if (args.length > 1) args(1) else "plans/r15"
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = Tables.configure(SparkSession.builder())
      .master("local[4]").config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    for (q <- names) {
      try {
        val plan = SparkEntry.queries(q)(spark, d).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${q}_$tag.txt"), plan)
        println(s"[plandump] $q -> $outDir/${q}_$tag.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[plandump] $q FAILED: $e")
      }
    }
    spark.stop()
  }
}
