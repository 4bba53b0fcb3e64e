package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for out-of-band scale rehearsals.
  *
  * `/root/testdata` tops out at sf0.1 (and is read-only), so the sf1
  * rehearsal derives a ×N corpus from sf0.1 under the repo's target/
  * dir: `runMain graft.ScaleUp <sfDir> <outDir> [factor]`.
  *
  * Copy 0 is the original data (ids unchanged, so the ANN query/seed
  * sets vec_id < 5/16 still resolve); copies k ≥ 1 are made
  * structurally DISTINCT, not near-duplicates — a naive ×10 of the
  * corpus would give every document 9 exact clones and inflate the
  * near-dup pair output ~45× per clone set, which measures data
  * semantics, not operator scaling:
  *   - documents: tokens deterministically permuted per copy (sorted
  *     by md5(token#pos#copy)), which destroys shingle structure
  *     across copies while preserving token frequencies and length;
  *   - embeddings: components circularly rotated by the copy index
  *     (norm-preserving, distinct directions).
  * Everything is md5-keyed — no RNG — so reruns are identical.
  */
object ScaleUp {

  private val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    val factor = rest.headOption.map(_.toInt).getOrElse(10)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = spark.range(factor).select(col("id").as("copy"))

    val docs = Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    val permuted = concat_ws(" ", transform(
      array_sort(zip_with(toks, sequence(lit(1), size(toks)),
        (t, i) => struct(
          md5(concat_ws("#", t, i.cast("string"), col("copy").cast("string"))).as("k"),
          t.as("t")))),
      s => s.getField("t")))
    docs.crossJoin(copies)
      .select(
        (col("copy") * IdStride + col("doc_id")).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(permuted).as("text"),
        col("lang"), col("source"), col("n_chars"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")

    val emb = Tables.embeddings(spark, sfDir)
    val v = col("embedding")
    val rot = (col("copy") % 64).cast("int")
    val rotated = concat(
      slice(v, col("rot") + 1, size(v) - col("rot")),
      slice(v, lit(1), col("rot")))
    emb.crossJoin(copies)
      .withColumn("rot", rot)
      .select(
        (col("copy") * IdStride + col("vec_id")).as("vec_id"),
        when(col("copy") === 0, v).otherwise(rotated).as("embedding"))
      .repartition(32)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")

    println(s"""{"scaled": "$sfDir -> $outDir", "factor": $factor}""")
    spark.stop()
  }
}
