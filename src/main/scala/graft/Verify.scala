package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, extra @ _*) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Optional comma-separated filter for targeted local gate checks —
    // either a third CLI arg or SPARK_GRAFT_VERIFY_ONLY (e.g.
    // j_skew_salted,q1_pricing_summary); the driver runs unfiltered.
    val only = extra.headOption.orElse(sys.env.get("SPARK_GRAFT_VERIFY_ONLY"))
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val struckAt = System.currentTimeMillis()
    val struck = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries
      .filter { case (name, _) => only.forall(_.contains(name)) }
      .foreach { case (name, fn) =>
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        struck += name
      }
      catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    // A filtered run (SPARK_GRAFT_VERIFY_ONLY) into an outDir holding a
    // prior full run keeps the other queries' oracle entries alive
    // (ADVICE r5) but REFRESHES every entry from the current build —
    // the SQL map is free to compute, and a stale entry for a query
    // whose oracle text changed (but whose Spark result didn't) would
    // otherwise shadow the fix until the next full run (round 14: the
    // MATERIALIZED-hint sweep changed ~30 oracles' text with zero
    // Spark-side changes).
    val oraclePath = Paths.get(s"$outDir/oracle_sql.json")
    val prior: Map[String, String] =
      if (only.isDefined && Files.exists(oraclePath))
        graft.util.JsonParse.parse(Files.readString(oraclePath))
          .asInstanceOf[scala.collection.immutable.ListMap[String, Any]]
          .map { case (k, v) => k -> v.toString }
      else Map.empty
    val merged = prior ++ SparkEntry.oracleSql
    val json = merged
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(oraclePath, json)
    // Per-query build provenance (r14 ADVICE #5): a filtered run
    // refreshes every ORACLE entry but reruns only the subset's
    // PARQUET — struck_at.json records which parquet results this
    // invocation actually re-struck (and when), so a later selfcheck
    // mismatch on a query outside the subset can be labeled
    // stale-parquet instead of misread as a live regression. Merged
    // like the oracle map: entries for queries outside this run's
    // subset carry their prior timestamps forward.
    val struckPath = Paths.get(s"$outDir/struck_at.json")
    val priorStruck: Map[String, String] =
      if (Files.exists(struckPath))
        graft.util.JsonParse.parse(Files.readString(struckPath))
          .asInstanceOf[scala.collection.immutable.ListMap[String, Any]]
          .map { case (k, v) => k -> v.toString }
      else Map.empty
    val mergedStruck = priorStruck ++ struck.map(_ -> struckAt.toString)
    Files.writeString(struckPath, mergedStruck
      .map { case (k, v) => s"${q(k)}: $v" }.mkString("{", ",", "}"))
    spark.stop()
  }
}
