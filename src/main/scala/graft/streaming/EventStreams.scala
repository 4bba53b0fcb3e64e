package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, Trigger}
import org.apache.spark.sql.types._

/** Structured Streaming operators over the events table.
  *
  * The reference has no streaming (its `watch` flag is dead config —
  * SURVEY.md §0.1); these are the stream-processing operators a
  * training-data pipeline needs at scale: watermarked windowed
  * aggregation and stateful gap-based sessionization via
  * `mapGroupsWithState`. Both run here with `Trigger.AvailableNow`
  * against the driver's parquet so results are deterministic and
  * oracle-checkable against batch SQL; pointed at a live directory the
  * same code is a continuous pipeline.
  */
object EventStreams {

  /** Parquet schema of events.parquet as the stream source sees it
    * (ts = INT64 nanos, see Tables.configure). */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The file stream source requires a DIRECTORY; the driver testdata
    * is one parquet file per table, so expose it through a symlink dir
    * (a production deployment would already point at a directory). */
  private def streamDir(dir: String): String = {
    import java.nio.file.{Files, Paths}
    val src = Paths.get(s"$dir/events.parquet")
    val d = Paths.get(s"/tmp/graft_stream_${Math.abs(dir.hashCode)}")
    if (!Files.exists(d)) {
      Files.createDirectories(d)
      Files.createSymbolicLink(d.resolve("events.parquet"), src)
    }
    d.toString
  }

  private def readEvents(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(eventSchema)
      .parquet(streamDir(dir))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Daily tumbling-window counts + exact decimal sums per event type,
    * with a 1-hour watermark. Complete-mode memory sink: the driver
    * gate runs bounded data; a production run would append to a
    * parquet/Kafka sink with the same plan. */
  def windowedDaily(spark: SparkSession, dir: String, sinkName: String): DataFrame = {
    val q = readEvents(spark, dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd").as("day"),
        col("event_type"), col("n"), col("sum_value"))
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Complete())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }

  private case class Ev(userId: Long, tsMicros: Long)
  private case class SessionAgg(userId: Long, nSessions: Long, nEvents: Long)

  /** Stateful gap-based sessionization (30-min gap) with
    * mapGroupsWithState — the custom-state operator shape
    * (KeyValueGroupedDataset) the DataFrame API can't express. Events
    * are sorted inside the group because state functions see arrival
    * order. */
  private val sessionSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def sessionize(spark: SparkSession, dir: String, gapSeconds: Long = 1800): DataFrame = {
    import spark.implicits._
    val sinkName = s"stream_sessions_${sessionSeq.incrementAndGet()}"
    val q = readEvents(spark, dir)
      .select(col("user_id"), col("ts").cast("long").as("ts_sec"))
      .as[(Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[List[Long], SessionAgg](GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[(Long, Long)], state: GroupState[List[Long]]) =>
          val all = (state.getOption.getOrElse(Nil) ++ rows.map(_._2)).sorted
          state.update(all)
          var sessions = 0L
          var prev = Long.MinValue
          all.foreach { t =>
            if (prev == Long.MinValue || t - prev > gapSeconds) sessions += 1
            prev = t
          }
          SessionAgg(user, sessions, all.size.toLong)
      }
      .toDF("user_id", "n_sessions", "n_events")
      .writeStream.format("memory").queryName(sinkName)
      .outputMode(OutputMode.Update())
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(sinkName)
  }
}
