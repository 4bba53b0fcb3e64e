package graft

import java.nio.file.{Files, Path, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.queries.Dedup
import graft.streaming.DocStreams

/** The streaming standing-pipeline probe (`st_incr_neardup`) must
  * answer the batch incremental contract whatever the micro-batch
  * split: each batch's delta slice probes the same fixed persisted
  * index independently, so the union over batches is the batch answer.
  * Pinned under forced one-file-per-micro-batch splitting (the
  * StreamDedupSpec discipline) and in the single-batch default.
  */
class DocStreamSpec extends SparkSuite {

  /** sf0.001 documents split into 3 doc_id-striped files under
    * <tmp>/documents.parquet/, mtimes ascending so the file source
    * processes them in a fixed order. Striping (doc_id % 3) ensures
    * every file carries SOME delta docs, so all three probes do work. */
  private def splitDocsDir(): String = {
    val base = Files.createTempDirectory("graft_docstream_split")
    val docDir = base.resolve("documents.parquet")
    Files.createDirectories(docDir)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
    (0 until 3).foreach { i =>
      val scratch = Files.createTempDirectory(s"graft_docsplit_$i")
      docs.filter(pmod(col("doc_id"), lit(3)) === i).coalesce(1)
        .write.mode("overwrite").parquet(scratch.resolve("out").toString)
      val part = Files.list(scratch.resolve("out")).iterator()
      var f: Path = null
      while (part.hasNext) { val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) f = p }
      val dest = docDir.resolve(f"$i%02d.parquet")
      Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(2000000L + i * 60000L))
    }
    base.toString
  }

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("dup_of"), col("jaccard"), col("is_new"))
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) null else r.getLong(1),
        if (r.isNullAt(2)) null else r.getDouble(2),
        r.getBoolean(3))).toSeq

  test("single-batch stream == the batch incremental query") {
    val out = rows(DocStreams.incrNearDupStream(spark, "/root/testdata/sf0.001"))
    val batch = rows(SparkEntry.queries("d_incr_neardup")(spark, "/root/testdata/sf0.001"))
    assert(out == batch)
    assert(out.exists(!_._4), "some delta doc matches the corpus")
  }

  test("one-file-per-micro-batch split == the batch incremental query") {
    val dir = splitDocsDir()
    val out = rows(DocStreams.incrNearDupStream(spark, dir, maxFilesPerTrigger = Some(1)))
    val batch = rows(Dedup.incrementalNearDup(spark, dir, Dedup.MaxBandSize))
    assert(out == batch)
    assert(out.exists(!_._4), "some delta doc matches the corpus")
  }
}
