package graft.usage

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Append-only usage log + windowed stats
  * (`/root/reference/src/ariadne_dbt/usage.py:21-137`,
  * `schema.sql:167-183`). The reference's ISO-string timestamps with
  * `substr(ts,1,10)` day-grouping become a real TimestampType +
  * `date_trunc` — an append-mode parquet table that Structured
  * Streaming could tail without schema changes.
  *
  * Two deltas from the SQLite original, both lake-idiomatic:
  *   - `log()` is a BUFFERED append (the reference's INSERT is sub-ms;
  *     a parquet write job is ~100 ms and would dominate the
  *     interactive latencies it instruments) — rows batch in memory and
  *     flush every [[UsageLog.FlushEvery]] calls, on [[flush]], and
  *     before any read;
  *   - ratings (an SQLite UPDATE in usage.py `rate`) become an
  *     append-only rating EVENT table joined at read time: no in-place
  *     mutation of immutable files, the newest event per `log_id` wins.
  */
class UsageLog(spark: SparkSession, path: String) {

  import UsageLog.FlushEvery
  import spark.implicits._

  private val ratingsPath = path + "_ratings"

  private type UsageRow = (Long, String, String, String, String, String, Long, Long, Long, Option[Long])
  private type RatingRow = (Long, Long, String, String)
  private val pendingUsage = scala.collection.mutable.ArrayBuffer.empty[UsageRow]
  private val pendingRatings = scala.collection.mutable.ArrayBuffer.empty[RatingRow]

  /** Monotonic log ids (usage.py returns SQLite lastrowid); seeded past
    * any ids already on disk so re-opened logs keep appending. An
    * existence probe gates the read: a fresh log would otherwise throw
    * (and log a scary PATH_NOT_FOUND trace) before the catch. */
  private val nextId = new AtomicLong(
    if (!UsageLog.pathExists(spark, path)) 0L
    else try spark.read.parquet(path).agg(max("log_id")).collect()
      .headOption.flatMap(r => Option(r.get(0)).map(_.asInstanceOf[Long])).getOrElse(0L)
    catch { case _: Throwable => 0L })

  /** Append one usage row; returns its log_id (usage.py:21-45). */
  def log(toolName: String, taskText: String, intent: String,
      tokenEstimate: Long, durationMs: Long, rating: Option[Int] = None,
      focusModel: Option[String] = None, pivotCount: Long = 0L): Long = synchronized {
    val id = nextId.incrementAndGet()
    pendingUsage += ((id, java.time.Instant.now().toString, toolName, taskText,
      intent, focusModel.orNull, pivotCount, tokenEstimate, durationMs,
      rating.map(_.toLong)))
    if (pendingUsage.length >= FlushEvery) flush()
    id
  }

  /** Rate a logged call 1–5 (clamped, usage.py:47-52) — appends a
    * rating event; the newest event per log_id wins at read time. */
  def rate(logId: Long, rating: Int, notes: Option[String] = None): Unit = synchronized {
    pendingRatings += ((logId, math.max(1, math.min(5, rating)).toLong,
      notes.orNull, java.time.Instant.now().toString))
    if (pendingRatings.length >= FlushEvery) flush()
  }

  /** Write buffered rows to the parquet sinks. */
  def flush(): Unit = synchronized {
    if (pendingUsage.nonEmpty) {
      pendingUsage.toSeq
        .toDF("log_id", "ts", "tool_name", "task_text", "intent", "focus_model",
          "pivot_count", "token_estimate", "duration_ms", "rating")
        .withColumn("ts", to_timestamp(col("ts")))
        .write.mode("append").parquet(path)
      pendingUsage.clear()
    }
    if (pendingRatings.nonEmpty) {
      pendingRatings.toSeq
        .toDF("log_id", "event_rating", "notes", "rated_at")
        .withColumn("rated_at", to_timestamp(col("rated_at")))
        .write.mode("append").parquet(ratingsPath)
      pendingRatings.clear()
    }
  }

  /** Usage rows with the effective rating: the newest rating event,
    * else the rating captured at log time. */
  def all(): DataFrame = {
    flush()
    val usage = spark.read.parquet(path)
    val events =
      if (!UsageLog.pathExists(spark, ratingsPath)) None
      else try {
        val w = Window.partitionBy(col("log_id"))
          .orderBy(col("rated_at").desc, col("event_rating").desc)
        Some(spark.read.parquet(ratingsPath)
          .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
          .select(col("log_id"), col("event_rating"), col("notes")))
      } catch { case _: Throwable => None }
    events.fold(usage.withColumn("notes", lit(null).cast("string"))) { ev =>
      usage.join(broadcast(ev), Seq("log_id"), "left")
        .withColumn("rating", coalesce(col("event_rating"), col("rating")))
        .drop("event_rating")
    }
  }

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
    all().orderBy(col("ts").desc, col("log_id").desc).limit(limit)
}

object UsageLog {
  /** Buffered rows per parquet append. */
  val FlushEvery = 64

  /** True when `path` exists on the session's Hadoop filesystem —
    * works for any supported scheme, not just local files. */
  private[usage] def pathExists(spark: SparkSession, path: String): Boolean =
    try {
      val p = new org.apache.hadoop.fs.Path(path)
      p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
    } catch { case _: Throwable => false }
}
