package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The exact-dedup keeper pick must be the skew-safe two-stage MIN
  * aggregation + join, not a row_number window over content_hash (r8
  * VERDICT #5): a window partition cannot be split, so one digest
  * covering a large corpus fraction (the ×64 copy-rehearsal shape at
  * higher copy counts) would serialize that fraction through one task.
  * Partial (map-side) min collapses the agg's shuffle input, and the
  * probe join back is an equi-join AQE's skew-join can split.
  */
class ExactDedupSkewSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def gate(dir: String): DataFrame =
    SparkEntry.queries("d_exact_dedup")(spark, dir)

  test("agg+join keeper equals the retired window formulation row-for-row") {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    val w = Window.partitionBy(col("content_hash")).orderBy(col("doc_id"))
    val windowed = Tables.documents(spark, d)
      .select(col("doc_id"), md5(norm).as("content_hash"))
      .withColumn("rn", row_number().over(w))
      .select(col("doc_id"), col("content_hash"), (col("rn") === 1).as("is_keeper"))
      .orderBy(col("doc_id"))
    assert(gate(d).collect().toSeq === windowed.collect().toSeq)
  }

  test("the gate plan carries no window — keeper rides partial-agg + join") {
    val plan = gate(d).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"),
      s"d_exact_dedup must not window over content_hash:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial min"),
      s"keeper min must partial-aggregate map-side:\n$plan")
  }

  test("a single digest covering most of the corpus still dedups correctly") {
    import spark.implicits._
    // 90% of docs share one text (one hot digest), 10% unique.
    val docs = (0L until 200L).map { i =>
      val text = if (i % 10 == 0) s"unique text number $i" else "the same hot text"
      (i, text, "en", "test", text.length.toLong)
    }.toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_skew").toString
    docs.repartition(4).write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "documents.parquet").toString)
    val res = gate(tmp).collect()
    assert(res.length === 200)
    val keepers = res.filter(_.getBoolean(2)).map(_.getLong(0)).toSet
    // hot digest's keeper is its min doc_id (1); every unique doc keeps
    assert(keepers === (0L until 200L by 10).toSet + 1L)
  }
}
