package graft

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.file.attribute.FileTime

import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Pins the watermark assumption ADVICE r4 flagged: streaming dedup
  * must stay exact when the replay is SPLIT across micro-batches
  * (maxFilesPerTrigger=1), not just when AvailableNow happens to take
  * everything in one batch. Two properties:
  *   - a duplicate can never be stranded behind the watermark, because
  *     re-delivery is an in-row explode — dup and original are in the
  *     same batch by construction;
  *   - chronologically-ordered file arrival (the production ingest
  *     contract) keeps first deliveries ahead of the watermark, so
  *     nothing is dropped.
  */
class StreamDedupSpec extends SparkSuite {

  /** sf0.001 events split into 3 chronological files under
    * <tmp>/events.parquet/, modification times ascending so the file
    * source processes them oldest-first. */
  private def splitEventsDir(): String = {
    val base = Files.createTempDirectory("graft_stream_split")
    val evDir = base.resolve("events.parquet")
    Files.createDirectories(evDir)
    // The NORMALIZED reader (ts always TimestampType regardless of the
    // driver's encoding of the round); the split files then carry
    // timestamp[us] and the stream source's adaptive schema reads them.
    val ev = Tables.events(spark, "/root/testdata/sf0.001")
    val tsl = col("ts").cast("double") // epoch seconds, for the numeric-only quantile
    val Array(t1, t2) = ev.select(tsl.as("tsl")).stat.approxQuantile("tsl", Array(0.33, 0.66), 0.0)
    val ranges = Seq(
      tsl <= t1, tsl > t1 && tsl <= t2, tsl > t2)
    ranges.zipWithIndex.foreach { case (cond, i) =>
      val scratch = Files.createTempDirectory(s"graft_split_$i")
      ev.filter(cond).coalesce(1).write.mode("overwrite")
        .parquet(scratch.resolve("out").toString)
      val part = Files.list(scratch.resolve("out")).iterator()
      var f: Path = null
      while (part.hasNext) { val p = part.next()
        if (p.getFileName.toString.endsWith(".parquet")) f = p }
      val dest = evDir.resolve(f"$i%02d.parquet")
      Files.move(f, dest, StandardCopyOption.REPLACE_EXISTING)
      Files.setLastModifiedTime(dest, FileTime.fromMillis(1000000L + i * 60000L))
    }
    base.toString
  }

  test("a RELATIVE sf dir streams the same rows as the absolute path") {
    // Round-6 regression: streamDir's symlinks used to inherit the
    // caller's relative path as the link TARGET, which dangles from
    // inside /tmp — the file source then silently read zero files.
    val rel = splitEventsDir()
    val abs = Paths.get(rel).toAbsolutePath
    // A relative spelling of the same dir, as seen from the test CWD.
    val relSpelling = Paths.get("").toAbsolutePath.relativize(abs).toString
    val viaRel = EventStreams.dedupedStream(spark, relSpelling,
      "stream_dedup_relpath_test").count()
    val viaAbs = EventStreams.dedupedStream(spark, abs.toString,
      "stream_dedup_abspath_test").count()
    assert(viaRel > 0, "relative dir must not silently stream zero files")
    assert(viaRel == viaAbs)
  }

  test("dedup stays exact when the replay splits into one-file micro-batches") {
    val dir = splitEventsDir()
    val deduped = EventStreams.dedupedStream(spark, dir,
      "stream_dedup_split_test", maxFilesPerTrigger = Some(1))
    val batch = Tables.t(spark, dir, "events")
    val nDistinct = batch.select(countDistinct(col("event_id"))).head().getLong(0)
    assert(deduped.count() == nDistinct,
      "multi-batch replay must yield exactly the distinct event set")
    // and the source genuinely carried duplicates to remove
    assert(batch.filter(col("event_id") % 10 === 0).count() > 0)
  }

  test("a stream can start on an existing-but-empty source dir") {
    // r7 ADVICE: the footer-probing reader threw on a source dir with
    // no files yet (a stream started before data arrives — the
    // pre-probe hard-coded schema supported it). The probe now falls
    // back to the historical LongType encoding, uncached, so the
    // first real file re-probes.
    val base = Files.createTempDirectory("graft_stream_empty")
    Files.createDirectories(base.resolve("events.parquet"))
    val out = EventStreams.windowedDaily(spark, base.toString,
      "stream_empty_dir_test")
    assert(out.count() == 0, "an empty source yields an empty result, not an exception")
  }
}
