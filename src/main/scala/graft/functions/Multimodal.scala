package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extraction running as pure column pipelines.
  *
  * The container has no image/audio codecs, so the decoder is a
  * DETERMINISTIC STUB (byte-level statistics standing in for
  * decode→resize→feature-extract); the Spark-side contract — binary
  * column schema, metadata struct, typed output schema, one-row-per-
  * frame generation — is real and oracle-checked. The byte kernel is
  * the native codegen expression [[ByteSum]] (`graft_byte_sum`), so the
  * whole decode stays inside WholeStageCodegen with no
  * DataFrame→RDD→DataFrame encoder round-trip; a real codec would
  * replace that kernel with an `mapInArrow`/`mapInPandas` stage that
  * batches rows the same way.
  */
object Multimodal {

  private val Mod = 1000000007L

  /** Attach an opaque binary payload + metadata struct to documents —
    * the shape of an image/audio table: (id, payload binary, meta). */
  def attachBinary(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(lit("text/plain").as("mime"),
        octet_length(col("text")).as("n_bytes"),
        col("source").as("origin")).as("meta"))

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("first_byte", IntegerType),
    StructField("checksum", LongType),
    StructField("n_frames", IntegerType)))

  val frameSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("frame_idx", IntegerType),
    StructField("frame_bytes", IntegerType),
    StructField("frame_checksum", LongType)))

  /** Frame sampling: cut the payload into fixed 64-byte frames and keep
    * every `stride`-th one with a per-frame checksum — the shape of
    * video frame-sampling / audio windowing, one output row per kept
    * frame. explode(sequence(...)) generates the kept-frame indices and
    * `substring` windows the payload, so frame extraction is columnar
    * (one codegen stage) instead of an RDD flatMap. */
  def sampleFrames(binary: DataFrame, frameSize: Int = 64, stride: Int = 4): DataFrame = {
    ByteSum.register(binary.sparkSession)
    binary
      .select(col("doc_id"), col("payload"),
        expr(s"cast(octet_length(payload) div $frameSize as int)").as("n_frames"))
      .filter(col("n_frames") > 0)
      .select(col("doc_id"), col("payload"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
      .select(col("doc_id"), col("frame_idx"),
        lit(frameSize).as("frame_bytes"),
        (expr(s"graft_byte_sum(substring(payload, frame_idx * $frameSize + 1, $frameSize))")
          % Mod).as("frame_checksum"))
  }

  /** Columnar "decode": size / first-byte / additive-checksum / fake
    * frame count (n_bytes/64, a stand-in for frame sampling), all from
    * codegen'd built-ins plus the [[ByteSum]] kernel. */
  def decodeFeatures(binary: DataFrame): DataFrame = {
    ByteSum.register(binary.sparkSession)
    binary.select(
      col("doc_id"),
      octet_length(col("payload")).as("n_bytes"),
      when(octet_length(col("payload")) > 0,
        conv(hex(substring(col("payload"), 1, 1)), 16, 10).cast("int"))
        .otherwise(lit(0)).as("first_byte"),
      (expr("graft_byte_sum(payload)") % Mod).as("checksum"),
      expr("cast(octet_length(payload) div 64 as int)").as("n_frames"))
  }
}
