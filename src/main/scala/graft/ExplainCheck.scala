import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[4]").config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    val qs =
      if (args.nonEmpty) args.toSeq
      else Seq("s2_scan_project", "q5_star_join", "q3_shipping_priority", "o2_bm25_topk",
        "d_embed_neardup", "d_simhash_pairs", "ann_lsh", "d_minhash_lsh")
    for (q <- qs) {
      println(s"\n===== $q =====")
      val plan = graft.SparkEntry.queries(q)(spark, d).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      // keep output short: scans, joins, exchanges, codegen spans
      plan.linesIterator.filter(l =>
        l.contains("Scan parquet") || l.contains("PushedFilters") || l.contains("ReadSchema") ||
        l.contains("Join") || l.contains("Exchange") || l.contains("WholeStageCodegen") ||
        l.contains("TakeOrdered")).take(30).foreach(println)
    }
    spark.stop()
  }
}
