package graft.queries

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps
import graft.util.Scratch

/** Persisted IVF index — the ANN counterpart of
  * [[graft.search.PostingsIndex]]: an index is BUILT ONCE per corpus
  * (k-means training + corpus assignment) and probed many times, so no
  * per-query work may depend on corpus size beyond the probed buckets.
  *
  * Build: spherical k-means (Lloyd) from a deterministic seed set with
  * integer-quantized component sums (order-independent, so the DuckDB
  * oracle replays training exactly — see `Ann.kmeansIterCte`), then the
  * corpus is assigned to its nearest centroid and written as a
  * bucketed-by-cid, sorted-by-cid table (repartitioned by cid first so
  * each bucket is exactly one file). Bucketing is the 100 TB lever: a
  * probe that filters `cid IN (probed…)` bucket-PRUNES the scan —
  * `SelectedBucketsCount` in the plan — so a probe reads only the
  * probed buckets off disk, never the rest of the corpus
  * (plan-asserted by PlanSpec).
  *
  * The trained centroid table is tiny (numCentroids rows) and kept as a
  * localCheckpoint for broadcast into probe selection.
  */
object IvfIndex {

  final class Index(spark: SparkSession, tableName: String,
      val centroids: DataFrame, numCentroids: Int) {
    /** (vec_id, v, cid), bucketed by cid. */
    def assigned: DataFrame = spark.table(tableName)

    /** Incrementally index `e2` (normalized (vec_id, v) rows with NEW
      * vec_ids) under FROZEN centroids: the delta is assigned to its
      * nearest existing centroid and appended into the bucketed table
      * — cost scales with the delta, never the corpus. Centroids are
      * deliberately not retrained (retraining is a rebuild decision a
      * production pipeline takes offline when drift warrants it); the
      * appended table is bit-identical to assigning old∪new under the
      * same centroids (IvfAppendSpec). Returns this index — probes see
      * the appended buckets immediately. */
    def append(e2: DataFrame): Index = {
      assign(e2, centroids)
        .select(col("vec_id"), col("v"), col("cid"))
        .repartition(numCentroids, col("cid"))
        .write.mode("append")
        .bucketBy(numCentroids, "cid").sortBy("cid")
        .option("path", Scratch.dir(tableName))
        .saveAsTable(tableName)
      this
    }
  }

  /** Per-vector argmax as max_by under groupBy (NOT a row_number
    * window): partial aggregation combines map-side, so the shuffle
    * moves n rows instead of n×centroids. Tie-break (ccos desc, cid
    * asc) via the (ccos, -cid) key struct matches the oracle's
    * ROW_NUMBER ordering. */
  private def assign(e: DataFrame, toCent: DataFrame): DataFrame =
    e.crossJoin(broadcast(toCent))
      .select(col("vec_id"), col("v"), col("cid"), expr("graft_dot(v, cv)").as("ccos"))
      .groupBy(col("vec_id"))
      .agg(max_by(col("cid"), struct(col("ccos"), -col("cid"))).as("cid"),
        any_value(col("v")).as("v"))

  // One index per (session, corpus): repeated queries — bench rounds,
  // Verify — probe the built table instead of re-training per call.
  // Keyed on sessionUUID (guaranteed unique, unlike identityHashCode
  // which can collide or be reused after GC).
  private val cache = new ConcurrentHashMap[String, Index]()

  /** Build-or-reuse the IVF index for corpus `corpusKey`. `e` (the
    * normalized (vec_id, v) frame with `graft_dot` registered) is
    * by-name: on a cache hit the normalization pass never runs — the
    * index table already stores the normalized vectors, so repeated
    * queries are probe-only. */
  def of(spark: SparkSession, corpusKey: String, e: => DataFrame,
      numCentroids: Int, iters: Int, quantScale: Double): Index = {
    val key = graft.util.Scratch.sessionId(spark) + "|" + corpusKey
    cache.computeIfAbsent(key,
      _ => build(spark, corpusKey, e, numCentroids, iters, quantScale))
  }

  private def build(spark: SparkSession, corpusKey: String, e: DataFrame,
      numCentroids: Int, iters: Int, quantScale: Double): Index = {
    var cent = e.filter(col("vec_id") < numCentroids)
      .select(col("vec_id").as("cid"), col("v").as("cv"))
    for (_ <- 1 to iters) {
      val means = assign(e, cent)
        .select(col("cid"), posexplode(col("v")).as(Seq("dim", "val")))
        .groupBy(col("cid"), col("dim"))
        .agg(sum(floor(col("val") * quantScale + 0.5)).as("sq"),
          count(lit(1)).as("n"))
        .groupBy(col("cid"))
        .agg(transform(
          array_sort(collect_list(struct(col("dim"),
            (col("sq").cast("double") / col("n").cast("double") / quantScale)
              .as("comp")))),
          x => x.getField("comp")).as("cv0"))
      cent = means
        .withColumn("nrm", sqrt(VectorOps.norm2(col("cv0"))))
        .select(col("cid"), transform(col("cv0"), x => x / col("nrm")).as("cv"))
    }
    cent = cent.localCheckpoint()

    val tableName = Scratch.tableName("graft_ivf", corpusKey)
    spark.sql(s"DROP TABLE IF EXISTS $tableName")
    // One shuffle by cid so each bucket lands as a single file: the
    // bucketed-table writer emits one file per (task, bucket), so
    // without this a 32-partition input fans out into up to 32×buckets
    // small files and every probe pays the file-open overhead.
    assign(e, cent)
      .select(col("vec_id"), col("v"), col("cid"))
      .repartition(numCentroids, col("cid"))
      .write.mode("overwrite")
      .bucketBy(numCentroids, "cid").sortBy("cid")
      .option("path", Scratch.dir(tableName))
      .saveAsTable(tableName)
    new Index(spark, tableName, cent, numCentroids)
  }
}
