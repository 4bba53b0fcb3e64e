package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic corpus scale-up for out-of-band scale rehearsals.
  *
  * `/root/testdata` tops out at sf0.1 (and is read-only), so the sf1
  * rehearsal derives a ×N corpus from sf0.1 under the repo's target/
  * dir: `runMain graft.ScaleUp <sfDir> <outDir> [factor]`. The output
  * dir carries EVERY table, so the full bench suite runs against it:
  *
  *   - facts scale ×N with strided keys: `orders`/`lineitem` (strided
  *     o_orderkey/l_orderkey so the order⋈lineitem join fans out
  *     correctly and per-order groups stay order-sized), `events`
  *     (strided event_id AND user_id — ×N users, not ×N events per
  *     user, so streaming state scales in KEY COUNT, the axis a real
  *     deployment grows on);
  *   - dimensions (`region nation customer supplier part`) copy
  *     unscaled — the realistic star shape (facts grow, dims don't),
  *     and exactly what keeps broadcast joins broadcast-able at 100 TB;
  *   - `documents`: tokens deterministically permuted per copy (sorted
  *     by md5(token#pos#copy)), which destroys shingle structure
  *     across copies while preserving token frequencies and length;
  *   - `embeddings`: components circularly rotated by the copy index
  *     (norm-preserving, distinct directions). Rotation cycles at the
  *     vector dimensionality (64), so factor is capped there — copy 64
  *     would alias copy 0 and re-introduce the exact-clone pair
  *     inflation this design exists to avoid (r4 ADVICE).
  *
  * Copy 0 is the original data (ids unchanged, so the ANN query/seed
  * sets vec_id < 5/16 still resolve); copies k ≥ 1 are structurally
  * DISTINCT, not near-duplicates — a naive ×10 would give every
  * document 9 exact clones and inflate near-dup pair output ~45× per
  * clone set, measuring data semantics instead of operator scaling.
  * Everything is md5-keyed — no RNG — so reruns are identical.
  */
object ScaleUp {

  private val IdStride = 10000000L

  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir, rest @ _*) = args
    val factor = rest.headOption.map(_.toInt).getOrElse(10)
    require(factor >= 1 && factor <= 64,
      s"factor must be in [1, 64]: embedding rotation aliases at the " +
        s"64-dim cycle (got $factor)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = spark.range(factor).select(col("id").as("copy"))
    def write(df: DataFrame, name: String, parts: Int = 32): Unit =
      df.repartition(parts).write.mode("overwrite")
        .parquet(s"$outDir/$name.parquet")

    // Fact tables: cross-join with the copy set, stride the keys that
    // must stay unique / join-consistent, keep every other column.
    def strided(df: DataFrame, keyCols: String*): DataFrame =
      keyCols.foldLeft(df.crossJoin(copies)) { (d, k) =>
        d.withColumn(k, col("copy") * IdStride + col(k))
      }.drop("copy")

    write(strided(Tables.orders(spark, sfDir), "o_orderkey"), "orders")
    write(strided(Tables.lineitem(spark, sfDir), "l_orderkey"), "lineitem")
    // events.ts arrives as INT64 nanos (Tables.configure) and is
    // written back as plain int64 — Tables.events and EventStreams
    // both handle the long-typed column.
    write(strided(Tables.t(spark, sfDir, "events"), "event_id", "user_id"),
      "events")

    // Dimensions: verbatim copy, original size.
    for (dim <- Seq("region", "nation", "customer", "supplier", "part"))
      write(Tables.t(spark, sfDir, dim), dim, parts = 1)

    val docs = Tables.documents(spark, sfDir)
    val toks = split(col("text"), " ")
    val permuted = concat_ws(" ", transform(
      array_sort(zip_with(toks, sequence(lit(1), size(toks)),
        (t, i) => struct(
          md5(concat_ws("#", t, i.cast("string"), col("copy").cast("string"))).as("k"),
          t.as("t")))),
      s => s.getField("t")))
    write(docs.crossJoin(copies)
      .select(
        (col("copy") * IdStride + col("doc_id")).as("doc_id"),
        when(col("copy") === 0, col("text")).otherwise(permuted).as("text"),
        col("lang"), col("source"), col("n_chars")), "documents")

    val emb = Tables.embeddings(spark, sfDir)
    val v = col("embedding")
    val rot = (col("copy") % 64).cast("int")
    val rotated = concat(
      slice(v, col("rot") + 1, size(v) - col("rot")),
      slice(v, lit(1), col("rot")))
    write(emb.crossJoin(copies)
      .withColumn("rot", rot)
      .select(
        (col("copy") * IdStride + col("vec_id")).as("vec_id"),
        when(col("copy") === 0, v).otherwise(rotated).as("embedding")), "embeddings")

    println(s"""{"scaled": "$sfDir -> $outDir", "factor": $factor}""")
    spark.stop()
  }
}
