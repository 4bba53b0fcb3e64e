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

  private def ledgerRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("doc_id"), col("quality_score"), col("dup_of"),
        col("jaccard"), col("reason"), col("keep"))
      .collect().map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        r.getString(4), r.getBoolean(5))).toSeq

  test("single-batch evolve stream == the one-shot incremental ledger") {
    val d = "/root/testdata/sf0.001"
    val out = ledgerRows(DocStreams.incrEvolveStream(spark, d))
    val oneShot = ledgerRows(SparkEntry.queries("pipe_incr_clean")(spark, d))
    assert(out == oneShot,
      "all delta files in one micro-batch must degenerate to pipe_incr_clean")
    assert(out.exists(_._6) && out.exists(!_._6), "both verdicts exercised")
  }

  test("evolve stream with the embed stage == the one-shot embed ledger (single batch)") {
    val d = "/root/testdata/sf0.001"
    def embRows(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("quality_score"), col("dup_of"), col("jaccard"),
          col("emb_dup_of"), col("emb_cosine"), col("reason"), col("keep"))
        .collect().map(r => (r.getLong(0), r.getDouble(1),
          if (r.isNullAt(2)) null else r.getLong(2),
          if (r.isNullAt(3)) null else r.getDouble(3),
          if (r.isNullAt(4)) null else r.getLong(4),
          if (r.isNullAt(5)) null else r.getDouble(5),
          r.getString(6), r.getBoolean(7))).toSeq
    val out = embRows(DocStreams.incrEvolveStream(spark, d, withEmbed = true))
    val oneShot = embRows(SparkEntry.queries("pipe_incr_clean_embed")(spark, d))
    assert(out == oneShot,
      "all delta files in one micro-batch must degenerate to pipe_incr_clean_embed")
    // The synthetic corpus holds no ≥0.9-cosine pairs (measured in
    // BENCH_embed_bands.json), so at the acting tier
    // (Dedup.EmbedActThreshold) NOTHING flags here — the stage firing
    // is pinned by the seeded fixtures in CorpusCleanSpec ("embed
    // stage acts only at the >=0.9 tier", "evolve embed stage");
    // all-null emb columns are this corpus's CORRECT ledger.
    assert(!out.exists(_._7 == "embed_dup"),
      "sf0.001 holds no acting-tier pairs: embed_dup must not fire")
    assert(out.forall(r => r._5 == null && r._6 == null),
      "below-tier matches must not be reported either")
  }

  test("evolve stream: a later micro-batch dedups against an earlier batch's ACCEPTED docs") {
    import spark.implicits._
    // corpus docs 1,2 (doc_id % 10 != 0) + delta doc 30 in the FIRST
    // file; delta doc 40 = near-dup of 30 (one interior word changed,
    // J ≈ 0.90) in the SECOND file. Per-file batches: 30 is accepted
    // and appended to the branches, so 40 is flagged near_dup — the
    // cross-batch closure. In ONE batch both are kept (delta-internal
    // near-dup is the batch kernel's contract, not the ledger's) —
    // both sides of the boundary dependence pinned.
    val longA = "the " + (1 to 60).map(i => s"word$i").mkString(" ")
    val longB = longA.replace("word57", "changed")
    def df(rows: Seq[(Long, String)]) = rows
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val base = Files.createTempDirectory("graft_evolve_stream")
    val docDir = base.resolve("documents.parquet")
    Files.createDirectories(docDir)
    val fileSets = Seq(
      Seq(1L -> "some corpus of the day with a calm and ordinary tone here",
        2L -> "another corpus doc is around for the membership side",
        30L -> longA),
      Seq(40L -> longB))
    fileSets.zipWithIndex.foreach { case (rows, i) =>
      val scratch = Files.createTempDirectory(s"graft_evs_$i")
      df(rows).coalesce(1).write.mode("overwrite")
        .parquet(scratch.resolve("out").toString)
      val part = Files.list(scratch.resolve("out")).iterator()
      var f: Path = null
      while (part.hasNext) { val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) f = p }
      val dest = docDir.resolve(f"$i%02d.parquet")
      Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(3000000L + i * 60000L))
    }
    // Force the session-shared index build first: those three tables
    // legitimately persist (of() cache); only the branch overlays must
    // not outlive a stream run.
    Dedup.incrIndex(spark, base.toString)
    Dedup.digestIndex(spark, base.toString)
    val tablesBefore = spark.catalog.listTables().count()

    val split = ledgerRows(DocStreams.incrEvolveStream(spark, base.toString,
      maxFilesPerTrigger = Some(1))).map(r => r._1 -> (r._3, r._5)).toMap
    assert(split(30L) == ((null, "kept")), s"batch-1 doc 30 is accepted: $split")
    assert(split(40L) == ((30L, "near_dup")),
      s"doc 40 must be flagged against batch-1's accepted doc 30: $split")

    val oneBatch = ledgerRows(DocStreams.incrEvolveStream(spark, base.toString))
      .map(r => r._1 -> r._5).toMap
    assert(oneBatch(30L) == "kept" && oneBatch(40L) == "kept",
      s"in one batch the near-dup pair is delta-internal — both kept: $oneBatch")

    assert(spark.catalog.listTables().count() == tablesBefore,
      "branch overlay tables must be dropped after each stream run")
  }
}
