package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.Multimodal
import graft.streaming.EventStreams

/** Structured-Streaming and multimodal operator gate queries. The
  * streaming entries genuinely run readStream → writeStream
  * (AvailableNow) and hand back the sink table; their oracles are the
  * batch-equivalent SQL, which bounded deterministic input guarantees
  * they match. */
object StreamQ {

  private val streamSeq = new java.util.concurrent.atomic.AtomicInteger(0)

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // Watermarked daily tumbling-window aggregation as a stream.
    "st_window_daily" -> ((s, d) => {
      EventStreams.windowedDaily(s, d, s"stream_window_${streamSeq.incrementAndGet()}")
        .orderBy(col("day"), col("event_type"))
    }),

    // Stateful sessionization via mapGroupsWithState.
    "st_sessionize" -> ((s, d) =>
      EventStreams.sessionize(s, d)
        .orderBy(col("user_id"))),

    // Streaming dedup: at-least-once delivery (every 10th event
    // re-delivered) deduped in-stream with watermark-bounded state;
    // per-type batch rollup of the deduped sink proves the duplicates
    // are gone.
    "st_dedup" -> ((s, d) =>
      EventStreams.dedupedStream(s, d, s"stream_dedup_${streamSeq.incrementAndGet()}")
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy(col("event_type"))),

    // Streaming standing-pipeline dedup: delta documents arrive as a
    // file stream, each micro-batch probes the PERSISTED corpus
    // MinHash index inside foreachBatch (build once, probe per batch —
    // the continuous form of d_incr_indexed). Batch probes are
    // independent against the fixed corpus, so the accumulated sink
    // equals the batch probe of the full delta; the oracle is the same
    // all-pairs ground truth as the batch gates. DocStreamSpec pins
    // multi-batch splitting.
    "st_incr_neardup" -> ((s, d) =>
      graft.streaming.DocStreams.incrNearDupStream(s, d)),

    // Multimodal: binary payload + metadata struct → partition-parallel
    // decode-stub features.
    "mm_decode_features" -> ((s, d) =>
      Multimodal.decodeFeatures(Multimodal.attachBinary(Tables.documents(s, d)))
        .orderBy(col("doc_id"))),

    // Multimodal: 64-byte frames, every 4th sampled, per-frame checksum.
    "mm_frame_sample" -> ((s, d) =>
      Multimodal.sampleFrames(Multimodal.attachBinary(Tables.documents(s, d)))
        .orderBy(col("doc_id"), col("frame_idx")))
  )

  def oracles: Map[String, String] = Map(
    "st_window_daily" ->
      """SELECT strftime(ts, '%Y-%m-%d') AS day, event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin,
    "st_sessionize" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions, COUNT(*) AS n_events FROM (
        |  SELECT user_id,
        |    CASE WHEN prev IS NULL OR sec - prev > 1800 THEN 1 ELSE 0 END AS new_session
        |  FROM (SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
        |          LAG(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |        FROM events))
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
    "st_dedup" ->
      """SELECT event_type, COUNT(*) AS n,
        |  CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,
    // The streaming probe answers the batch incremental contract.
    "st_incr_neardup" -> Dedup.incrNearDupSql,
    "mm_decode_features" ->
      """SELECT doc_id, strlen(text) AS n_bytes,
        |  unicode(substr(text, 1, 1)) AS first_byte,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(text, ''), c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> a + b) % 1000000007 AS checksum,
        |  strlen(text) // 64 AS n_frames
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """WITH f AS (
        |  SELECT doc_id, unnest(generate_series(0, CAST(strlen(text) // 64 AS INT) - 1, 4)) AS frame_idx
        |  FROM documents WHERE strlen(text) >= 64)
        |SELECT d.doc_id, f.frame_idx, 64 AS frame_bytes,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(string_split(substr(d.text, f.frame_idx * 64 + 1, 64), ''),
        |      c -> CAST(unicode(c) AS BIGINT))),
        |    (a, b) -> a + b) % 1000000007 AS frame_checksum
        |FROM f JOIN documents d USING (doc_id)
        |ORDER BY d.doc_id, f.frame_idx""".stripMargin
  )
}
