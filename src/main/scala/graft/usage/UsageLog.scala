package graft.usage

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Append-only usage log + windowed stats
  * (`/root/reference/src/ariadne_dbt/usage.py:21-137`,
  * `schema.sql:167-183`). The reference's ISO-string timestamps with
  * `substr(ts,1,10)` day-grouping become a real TimestampType +
  * `date_trunc` — an append-mode parquet table that Structured
  * Streaming could tail without schema changes.
  */
class UsageLog(spark: SparkSession, path: String) {

  import spark.implicits._

  def log(toolName: String, taskText: String, intent: String,
      tokenEstimate: Long, durationMs: Long, rating: Option[Int] = None): Unit =
    Seq((java.time.Instant.now().toString, toolName, taskText, intent,
      tokenEstimate, durationMs, rating.map(_.toLong)))
      .toDF("ts", "tool_name", "task_text", "intent", "token_estimate",
        "duration_ms", "rating")
      .withColumn("ts", to_timestamp(col("ts")))
      .write.mode("append").parquet(path)

  def all(): DataFrame = spark.read.parquet(path)

  /** Stats over the trailing `days` window (usage.py:57-127). */
  def stats(days: Int = 30): DataFrame = {
    val since = lit(java.time.Instant.now().minus(java.time.Duration.ofDays(days)).toString)
    val recent = all().filter(col("ts") >= to_timestamp(since))
    recent.agg(
      count(lit(1)).as("total_calls"),
      avg(col("token_estimate")).as("avg_tokens"),
      avg(col("duration_ms")).as("avg_duration_ms"),
      avg(col("rating")).as("avg_rating"))
  }

  def byTool(days: Int = 30): DataFrame = {
    val since = lit(java.time.Instant.now().minus(java.time.Duration.ofDays(days)).toString)
    all().filter(col("ts") >= to_timestamp(since))
      .groupBy("tool_name").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("tool_name"))
  }

  def daily(days: Int = 30): DataFrame = {
    val since = lit(java.time.Instant.now().minus(java.time.Duration.ofDays(days)).toString)
    all().filter(col("ts") >= to_timestamp(since))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"), avg(col("token_estimate")).as("avg_tokens"))
      .orderBy("day")
  }

  def recent(limit: Int = 20): DataFrame =
    all().orderBy(col("ts").desc).limit(limit)
}
