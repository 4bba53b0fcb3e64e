package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.IvfIndex
import graft.search.PostingsIndex

/** Index maintenance hygiene for the continuously-fed-corpus story:
  * every append leaves one more file per bucket behind, so compact()
  * must coalesce back to one file per bucket WITHOUT changing a single
  * score/probe result; the append disjointness contract (a re-sent doc
  * id would silently double-count) must be enforced, not just
  * documented; and the shared of() cache must always hand out the
  * newest instance (ADVICE r5: a stale handle scores with pre-append
  * collection stats). */
class CompactionSpec extends SparkSuite {

  private def docsDF(rows: Seq[(Long, String)]) = {
    import spark.implicits._
    rows.toDF("doc_id", "text")
  }

  // overlapping vocabulary on purpose: shared terms land in shared
  // buckets, so build+append stack >1 file in the same bucket and
  // compaction provably reduces the file count
  private val batchA = Seq(
    1L -> "spark shuffles the postings once",
    2L -> "bm25 ranks spark documents",
    3L -> "the quick brown fox",
    4L -> "postings live in buckets")
  private val batchB = Seq(
    5L -> "spark appends new postings",
    6L -> "the documents arrive continuously")

  private def parquetFiles(table: String): Int = {
    import scala.jdk.CollectionConverters._
    val d = java.nio.file.Paths.get(
      sys.props("user.dir"), "target", "graft_scratch", table)
    if (!java.nio.file.Files.exists(d)) 0
    else java.nio.file.Files.walk(d).iterator().asScala
      .count(_.getFileName.toString.endsWith(".parquet"))
  }

  test("postings compact: fewer files, bit-identical scores, cache refreshed") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val key = s"compact_$run"
    val base = PostingsIndex.of(docsDF(batchA), "doc_id", "text", key)
    val appended = base.append(docsDF(batchB), "doc_id", "text")

    // of() must already serve the appended instance (stale-stats fix)
    val served = PostingsIndex.of(docsDF(batchA), "doc_id", "text", key)
    assert(served.nDocs == 6L,
      "of() after append must see the merged corpus, not build-time stats")

    val filesBefore = parquetFiles(appended.tableName)
    val terms = Seq("spark", "postings", "the")
    val before = appended.score(terms).orderBy(col("doc"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))

    val compacted = appended.compact()
    val filesAfter = parquetFiles(compacted.tableName)
    assert(filesAfter < filesBefore,
      s"compaction must reduce files ($filesBefore -> $filesAfter)")
    val after = compacted.score(terms).orderBy(col("doc"))
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(after.sameElements(before), "compaction must not change scores")

    // r10 VERDICT weak row: the docs inventory (one row per document —
    // corpus-row-count sized) must be rewritten bucketed and in
    // parallel, never coalesce(1)'d through a single task. One file
    // per non-empty bucket ⇒ with 6 docs hashed across 32 buckets,
    // strictly more than one parquet file proves a multi-task write.
    assert(parquetFiles(compacted.tableName + "_docs") > 1,
      "compacted docs inventory must be written by multiple tasks (bucketed), " +
        "not funneled through coalesce(1)")
    val docsDesc = spark.sql(s"DESCRIBE TABLE EXTENDED ${compacted.tableName}_docs")
      .collect().map(r => r.getString(0) + " " + r.getString(1)).mkString("\n")
    assert(docsDesc.contains("Num Buckets") && docsDesc.contains("32"),
      "compacted docs inventory must be a bucketed table")

    // old generation's table + files are gone; cache serves the new one
    assert(!spark.catalog.tableExists(appended.tableName))
    assert(parquetFiles(appended.tableName) == 0)
    assert(PostingsIndex.of(docsDF(batchA), "doc_id", "text", key) eq compacted)
  }

  test("postings append with an already-indexed doc id is rejected") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val idx = PostingsIndex.of(docsDF(batchA), "doc_id", "text", s"guard_$run")
    val ex = intercept[IllegalArgumentException] {
      idx.append(docsDF(Seq(2L -> "re-delivered duplicate")), "doc_id", "text")
    }
    assert(ex.getMessage.contains("disjointness"))
    // the failed append must not have changed the index
    assert(idx.postings.select(countDistinct(col("doc"))).head().getLong(0) == 4L)
  }

  private def normalized(d: String): DataFrame = {
    graft.functions.DotProduct.register(spark)
    Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
  }

  test("ivf: duplicate append rejected; compact keeps probes, drops files") {
    val run = java.util.UUID.randomUUID().toString.take(8)
    val e = normalized("/root/testdata/sf0.001").localCheckpoint()
    val ids = e.select("vec_id").orderBy("vec_id").collect().map(_.getLong(0))
    val cut = ids(ids.length * 3 / 4)
    val idx = IvfIndex.of(spark, s"ivfc_$run", e.filter(col("vec_id") < cut),
      numCentroids = 4, iters = 1, quantScale = 1000000.0)
    idx.append(e.filter(col("vec_id") >= cut))

    val ex = intercept[IllegalArgumentException] {
      idx.append(e.limit(1))
    }
    assert(ex.getMessage.contains("disjointness"))

    val filesBefore = parquetFiles(idx.tableName)
    val before = idx.assigned.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val compacted = idx.compact()
    assert(parquetFiles(compacted.tableName) < filesBefore)
    val after = compacted.assigned.select("vec_id", "cid").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before, "compaction must not change assignments")
    assert(!spark.catalog.tableExists(idx.tableName))
    // r8: the pre-compaction handle fails fast with an actionable
    // message, not a bare missing-table error (MinhashIndexSpec pins
    // the same contract for the third index)
    val staleErr = intercept[IllegalStateException] { idx.assigned.count() }
    assert(staleErr.getMessage.contains("stale IvfIndex handle"))
  }

  test("postings: a stale handle fails fast after compaction") {
    val run = System.nanoTime()
    val idx = PostingsIndex.of(docsDF(batchA), "doc_id", "text", s"stale_$run")
    val compacted = idx.compact()
    val e = intercept[IllegalStateException] { idx.score(Seq("spark")).collect() }
    assert(e.getMessage.contains("stale PostingsIndex handle"))
    assert(compacted.score(Seq("spark")).count() > 0, "the returned handle keeps working")
  }
}
