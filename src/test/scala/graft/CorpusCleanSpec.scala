package graft

import org.apache.spark.sql.functions._

/** Library-level invariants of the incremental cleaning ledger
  * (`pipe_incr_clean`) — value-exactness against DuckDB is the oracle
  * gate's job; this spec pins the contract pieces the oracle can't
  * see: composition with the persisted-index probe, verdict
  * precedence, and the one-row-per-delta-doc ledger shape.
  */
class CorpusCleanSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val ledger =
    SparkEntry.queries("pipe_incr_clean")(spark, d).collect()

  test("one ledger row per delta doc; keep <=> reason kept") {
    val deltaCount = Tables.documents(spark, d)
      .filter(pmod(col("doc_id"), lit(10)) === 0).count()
    assert(ledger.length == deltaCount)
    assert(ledger.map(_.getLong(0)).distinct.length == ledger.length)
    ledger.foreach { r =>
      assert(r.getBoolean(5) == (r.getString(4) == "kept"))
    }
    assert(ledger.exists(!_.getBoolean(5)) && ledger.exists(_.getBoolean(5)),
      "corpus exercises both verdicts")
  }

  test("near_dup verdicts are exactly the persisted-index probe's hits minus exact dups") {
    val probeHits = SparkEntry.queries("d_incr_indexed")(spark, d)
      .filter(!col("is_new")).select(col("doc_id"))
      .collect().map(_.getLong(0)).toSet
    val exactDup = ledger.filter(_.getString(4) == "exact_dup").map(_.getLong(0)).toSet
    val nearDup = ledger.filter(_.getString(4) == "near_dup").map(_.getLong(0)).toSet
    assert(nearDup == (probeHits -- exactDup))
    assert(nearDup.nonEmpty, "corpus exercises the probe path")
    // Precedence: a probed hit that is ALSO an exact dup reports exact_dup,
    // and its dup_of/jaccard columns still carry the probe's best match.
    val both = probeHits.intersect(exactDup)
    both.foreach { id =>
      val r = ledger.find(_.getLong(0) == id).get
      assert(r.getString(4) == "exact_dup" && !r.isNullAt(2))
    }
  }

  test("exact_dup == corpus digest membership or within-batch repeat") {
    val norm = md5(regexp_replace(lower(trim(col("text"))), "\\s+", " "))
    val docs = Tables.documents(spark, d).select(col("doc_id"), norm.as("h"))
    val corpus = docs.filter(pmod(col("doc_id"), lit(10)) =!= 0)
      .select(col("h")).distinct().collect().map(_.getString(0)).toSet
    val delta = docs.filter(pmod(col("doc_id"), lit(10)) === 0)
      .collect().map(r => (r.getLong(0), r.getString(1))).sortBy(_._1)
    val seen = scala.collection.mutable.Set.empty[String]
    val expected = delta.flatMap { case (id, h) =>
      val dup = corpus.contains(h) || seen.contains(h)
      seen += h
      if (dup) Some(id) else None
    }.toSet
    assert(ledger.filter(_.getString(4) == "exact_dup").map(_.getLong(0)).toSet == expected)
  }

  test("pipe_incr_evolve at K=1 degenerates to pipe_incr_clean") {
    val evolved = graft.queries.CorpusClean.incrEvolve(spark, d, 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        r.getString(5), r.getBoolean(6))).toSeq
    assert(evolved.forall(_._2 == 0L), "one batch: every row is batch 0")
    val clean = ledger
      .map(r => (r.getLong(0), 0L, r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        r.getString(4), r.getBoolean(5))).toSeq
    assert(evolved == clean,
      "K=1 evolve (batch column dropped) must equal the one-shot ledger")
  }

  test("evolve sweeps its intermediate checkpoints; only the K ledgers survive") {
    // The r9 ADVICE checkpoint-hygiene contract: one invocation leaves
    // exactly its K eagerly-checkpointed ledger frames persisted (the
    // returned union reads them) — every probe/append intermediate the
    // loop checkpointed is unpersisted before return, so a long-lived
    // session does not accumulate dead blocks per run.
    val k = 2
    graft.queries.CorpusClean.incrEvolve(spark, d, 1).count() // warm shared indexes
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    val df = graft.queries.CorpusClean.incrEvolve(spark, d, k)
    assert(df.count() > 0)
    val leftover = spark.sparkContext.getPersistentRDDs.keySet -- baseline
    assert(leftover.size == k,
      s"expected exactly the $k ledger checkpoints to survive, got ${leftover.size}")
    spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (leftover.contains(id)) rdd.unpersist(blocking = false)
    }
  }

  test("pipe_incr_evolve_embed at K=1 degenerates to pipe_incr_clean_embed") {
    val evolved = graft.queries.CorpusClean
      .incrEvolve(spark, d, 1, withEmbed = true).collect()
      .map(r => (r.getLong(0), r.getDouble(2),
        if (r.isNullAt(3)) null else r.getLong(3),
        if (r.isNullAt(4)) null else r.getDouble(4),
        if (r.isNullAt(5)) null else r.getLong(5),
        if (r.isNullAt(6)) null else r.getDouble(6),
        r.getString(7), r.getBoolean(8))).toSeq
    val clean = SparkEntry.queries("pipe_incr_clean_embed")(spark, d).collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) null else r.getLong(2),
        if (r.isNullAt(3)) null else r.getDouble(3),
        if (r.isNullAt(4)) null else r.getLong(4),
        if (r.isNullAt(5)) null else r.getDouble(5),
        r.getString(6), r.getBoolean(7))).toSeq
    assert(evolved == clean,
      "K=1 embed evolve (batch column dropped) must equal the one-shot embed ledger")
  }

  test("evolve embed stage: accepted docs' vectors index; rejected docs' never do") {
    import spark.implicits._
    // K=3 batch assignment: batch = (doc_id % 30) / 10. vec_id ≡ doc_id.
    //   corpus:  1, 2 (kept shape, orthogonal one-hot vectors)
    //   batch 0: 30 kept long text A, vector w
    //            60 low_quality (digits), vector x       -> REJECTED
    //   batch 1: 40 fresh OK text, vector w (≡ 30's)     -> embed_dup of 30
    //            70 fresh OK text, vector x (≡ 60's)     -> kept (60's
    //               vector was never appended)
    //   batch 2: 50 fresh OK text, vector w              -> embed_dup of 30
    //            (NOT of 40 — 40 was embed_dup-rejected, so ITS vector
    //            was never appended either)
    val longA = "the " + (1 to 60).map(i => s"word$i").mkString(" ")
    val digits = ("1234567890 " * 30).trim
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == i) 1.0f else 0.0f)
    val docRows = Seq(
      (1L, "some corpus of the day with a calm and ordinary tone here"),
      (2L, "another corpus doc is around for the membership side"),
      (30L, longA),
      (60L, digits),
      (40L, "another fresh doc of the day with a calm and steady tone"),
      (70L, "a different closing doc of the day with a warm and easy tone"),
      (50L, "the last probe doc of the run with a plain and quiet tone"))
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val vecRows = Seq(
      (1L, oneHot(0)), (2L, oneHot(5)),
      (30L, oneHot(17)), (60L, oneHot(33)),
      (40L, oneHot(17)), (70L, oneHot(33)), (50L, oneHot(17)))
      .toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_evolve_emb").toString
    docRows.write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "documents.parquet").toString)
    vecRows.write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "embeddings.parquet").toString)
    val out = SparkEntry.queries("pipe_incr_evolve_embed")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(7),
        if (r.isNullAt(5)) -1L else r.getLong(5)))).toMap
    assert(out(30L) == ((0L, "kept", -1L)), s"batch-0 doc 30 is accepted: $out")
    assert(out(60L) == ((0L, "low_quality", -1L)), s"batch-0 doc 60 is rejected: $out")
    assert(out(40L) == ((1L, "embed_dup", 30L)),
      s"doc 40's vector duplicates ACCEPTED doc 30's across batches: $out")
    assert(out(70L) == ((1L, "kept", -1L)),
      s"doc 70's vector duplicates REJECTED doc 60's — never indexed: $out")
    assert(out(50L) == ((2L, "embed_dup", 30L)),
      s"doc 50 matches 30 (kept), not 40 (embed_dup-rejected, never appended): $out")
  }

  test("embed stage acts only at the >=0.9 tier; a mid-tier best match is not embed_dup") {
    import spark.implicits._
    // r11 VERDICT weak row: the ledger used to flag embed_dup at the
    // probe's 0.45 discovery floor — a recall claim sign-LSH cannot
    // honor at production width (mid-tier pairs flip ~35% of sign bits
    // and band-collide a few percent of the time). The acting tier is
    // now Dedup.EmbedActThreshold = 0.9, SPLIT from the discovery
    // floor; the mid-tier match below IS discovered by the probe
    // (cosine 0.64 ≥ 0.45, bands collide on the all-zero groups) and
    // must still NOT act.
    assert(graft.queries.Dedup.EmbedActThreshold == 0.9)
    def vec(dims: (Int, Float)*): Array[Float] = {
      val a = Array.fill(64)(0.0f); dims.foreach { case (i, x) => a(i) = x }; a
    }
    val keptText = (n: Int) => s"a calm and ordinary doc number $n of the day " +
      (1 to 50).map(i => s"tok${n}x$i").mkString(" ")
    val docRows = Seq(
      (1L, keptText(1)), (2L, keptText(2)), // corpus
      (10L, keptText(3)), (20L, keptText(4))) // delta
      .map { case (id, t) => (id, t, "en", "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val vecRows = Seq(
      (1L, vec(0 -> 1.0f)),          // corpus anchor u
      (2L, vec(5 -> 1.0f)),
      (10L, vec(0 -> 1.0f, 1 -> 0.3f)),  // cos(·,u) ≈ 0.958 — acting tier
      (20L, vec(0 -> 1.0f, 1 -> 1.2f)))  // cos(·,u) ≈ 0.640 — mid tier
      .toDF("vec_id", "embedding")
    val tmp = java.nio.file.Files.createTempDirectory("graft_act_tier").toString
    docRows.write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "documents.parquet").toString)
    vecRows.write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "embeddings.parquet").toString)
    val out = SparkEntry.queries("pipe_incr_clean_embed")(spark, tmp).collect()
      .map(r => r.getLong(0) -> ((r.getString(6),
        if (r.isNullAt(4)) -1L else r.getLong(4)))).toMap
    assert(out(10L) == (("embed_dup", 1L)),
      s"a ≥0.9 best match acts (and reports its corpus match): $out")
    assert(out(20L) == (("kept", -1L)),
      s"a mid-tier (0.45–0.9) best match must NOT act or report: $out")
    // and the discovery floor DID see the mid-tier pair — the probe
    // finds it; only the acting filter withholds the verdict.
    val probed = graft.queries.Dedup.embedIndex(spark, tmp)
    val raw = probed.probe(vecRows.filter(col("vec_id") % 10 === 0))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(2)) -1.0 else r.getDouble(2))).toMap
    assert(raw(20L) > 0.45 && raw(20L) < 0.9,
      s"fixture sanity: the mid-tier pair is discoverable at the 0.45 floor: $raw")
  }

  test("evolve: batch N+1 dedups against batch N's ACCEPTED docs only") {
    import spark.implicits._
    // K=3 batch assignment over delta ids: batch = (doc_id % 30) / 10.
    //   corpus:  1 (kept shape), 2
    //   batch 0: 30  kept long text A
    //            60  low_quality (digits)   -> REJECTED
    //   batch 1: 40  duplicates 30's text   -> exact_dup (vs accepted)
    //            70  duplicates 60's text   -> NOT exact_dup (60 was
    //                rejected, never indexed) -> low_quality itself
    //   batch 2: 50  near-dups 30's text    -> near_dup (vs accepted)
    // 61 distinct tokens -> 59 distinct 3-gram shingles; changing ONE
    // interior word alters 3 shingles: J = 56/62 ~= 0.90 >= 0.8.
    val longA = "the " + (1 to 60).map(i => s"word$i").mkString(" ")
    val longB = longA.replace("word57", "changed") // near-dup, not exact
    val digits = "1234567890 " * 30
    val rows = Seq(
      (1L, "some corpus of the day with a calm and ordinary tone here", "en"),
      (2L, "another corpus doc is around for the membership side", "en"),
      (30L, longA, "en"),
      (60L, digits.trim, "en"),
      (40L, longA, "en"),
      (70L, digits.trim, "en"),
      (50L, longB, "en"))
      .map { case (id, t, l) => (id, t, l, "web", t.length.toLong) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val tmp = java.nio.file.Files.createTempDirectory("graft_evolve").toString
    rows.write.mode("overwrite")
      .parquet(java.nio.file.Paths.get(tmp, "documents.parquet").toString)
    val out = SparkEntry.queries("pipe_incr_evolve")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(5))).toMap
    assert(out(30L) == (0L, "kept"), s"batch-0 doc 30 is accepted: $out")
    assert(out(60L) == (0L, "low_quality"), s"batch-0 doc 60 is rejected: $out")
    assert(out(40L) == (1L, "exact_dup"),
      s"doc 40 duplicates ACCEPTED doc 30 across batches: $out")
    assert(out(70L)._2 == "low_quality",
      s"doc 70 duplicates a REJECTED doc — never indexed, so its own verdict: $out")
    assert(out(50L) == (2L, "near_dup"),
      s"doc 50 near-dups accepted doc 30 two batches later: $out")
  }
}
