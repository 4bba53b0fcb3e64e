package graft.functions

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing: opaque binary payloads + typed metadata,
  * with decode / feature-extraction running partition-parallel over the
  * binary column.
  *
  * The container has no image/audio codecs, so the decoder is a
  * DETERMINISTIC STUB (byte-level statistics standing in for
  * decode→resize→feature-extract); the Spark-side contract — binary
  * column schema, metadata struct, partition-parallel batch processing,
  * typed output schema — is real and oracle-checked. A real codec would
  * replace only the inner loop of [[decodeFeatures]] (or an equivalent
  * `mapInPandas`/`mapInArrow` stage in PySpark, which batches rows the
  * same way).
  */
object Multimodal {

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
    * frame. Partition-parallel like [[decodeFeatures]]. */
  def sampleFrames(binary: DataFrame, frameSize: Int = 64, stride: Int = 4): DataFrame = {
    val spark = binary.sparkSession
    val rdd = binary.select(col("doc_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.flatMap { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        val nFrames = bytes.length / frameSize
        (0 until nFrames by stride).map { f =>
          var i = f * frameSize
          val end = i + frameSize
          var checksum = 0L
          while (i < end) { checksum += (bytes(i) & 0xff); i += 1 }
          Row(id, f, frameSize, checksum % 1000000007L)
        }
      }
    }
    spark.createDataFrame(rdd, frameSchema)
  }

  /** Partition-parallel "decode": per row a tight loop over the bytes
    * producing size / first-byte / additive-checksum / fake frame count
    * (n_bytes/64, a stand-in for frame sampling). mapPartitions so a
    * real decoder could amortize codec init per partition, exactly like
    * a Pandas-UDF batch would. */
  def decodeFeatures(binary: DataFrame): DataFrame = {
    val spark = binary.sparkSession
    val rdd = binary.select(col("doc_id"), col("payload")).rdd.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val bytes = r.getAs[Array[Byte]](1)
        var i = 0
        var checksum = 0L
        while (i < bytes.length) { checksum += (bytes(i) & 0xff); i += 1 }
        Row(id, bytes.length, if (bytes.nonEmpty) bytes(0) & 0xff else 0,
          checksum % 1000000007L, bytes.length / 64)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }
}
