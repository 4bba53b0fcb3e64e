package graft

import org.apache.spark.sql.functions._

/** Invariants of the training-prep operators, independent of scale
  * factor: packing is a true quotient/remainder layout of each
  * shard's token stream, and contamination never flags probe members
  * or leaves the [0, 1] overlap range. */
class TrainPrepSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  test("t_seq_pack: pack assignment is the quotient of the exclusive running sum") {
    val rows = SparkEntry.queries("t_seq_pack")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    // recompute per shard on the driver (sf0.001 is 50 docs)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, tokens, packId, off) =>
        assert(packId == cum / 2048, s"doc $id pack_id")
        assert(off == cum % 2048, s"doc $id pack_offset")
        cum += tokens
      }
    }
    assert(rows.forall(_._5 < 2048), "every document starts inside its pack")
  }

  test("t_seq_pack plans one exchange for the shard window (plus the output sort)") {
    val p = SparkEntry.queries("t_seq_pack")(spark, d)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "exactly one hash shuffle, on the shard key:\n" + p)
  }

  test("t_contamination: probe docs excluded, overlap in (0,1], flag consistent") {
    val rows = SparkEntry.queries("t_contamination")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getBoolean(4)))
    rows.foreach { case (id, hit, tot, ov, flag) =>
      assert(id % 7 != 0, s"probe doc $id must not appear in the corpus side")
      assert(hit >= 1 && hit <= tot, s"doc $id hit count in range")
      assert(math.abs(ov - hit.toDouble / tot) < 1e-15, s"doc $id ratio")
      assert(flag == (hit >= 0.5 * tot), s"doc $id flag")
    }
  }

  test("t_contamination: a duplicated probe document is fully contaminated") {
    import spark.implicits._
    // synthetic corpus: doc 8 is a verbatim copy of probe doc 0; doc 9
    // (NOT a multiple of 7, so it stays on the corpus side) shares no
    // 4-gram with the probe set and must be absent from the output
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta"),
      (9L, "unrelated words that share no four gram with the probe set"),
      (8L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    // route through the same query body by writing a scratch dir
    val tmp = java.nio.file.Files.createTempDirectory("tp").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val byId = SparkEntry.queries("t_contamination")(spark, tmp)
      .collect().map(r => (r.getLong(0), (r.getDouble(3), r.getBoolean(4)))).toMap
    assert(byId.contains(8L) && byId(8L)._1 == 1.0 && byId(8L)._2,
      "verbatim copy of a probe doc flags at overlap 1.0")
    assert(!byId.contains(9L), "gram-disjoint corpus doc does not appear")
  }

  test("t_span_dedup: shared chunks drop everywhere, order survives, dup docs vanish") {
    import spark.implicits._
    // Chunks are ALIGNED 8-token windows: docs 1 and 2 share their
    // first chunk verbatim (dropped from both), keep distinct tails;
    // doc 3 is 16 tokens all shared with doc 4 — both vanish.
    val shared = "the quick brown fox jumps over the lazy"
    val docs = Seq(
      (1L, s"$shared tail one unique to doc one only padding endone"),
      (2L, s"$shared tail two unique to doc two only padding endtwo"),
      (3L, "copy pasta block one two three four five copy pasta block six seven eight nine ten"),
      (4L, "copy pasta block one two three four five copy pasta block six seven eight nine ten"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val tmp = java.nio.file.Files.createTempDirectory("sd").toString
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("t_span_dedup")(spark, tmp)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out.keySet == Set(1L, 2L), "fully-shared docs 3 and 4 vanish")
    assert(out(1L)._1 == "tail one unique to doc one only padding endone" && out(1L)._2 == 2L)
    assert(out(2L)._1 == "tail two unique to doc two only padding endtwo" && out(2L)._2 == 2L)
  }

  test("t_span_dedup: the dup-span removal is a broadcast anti-join probe") {
    val p = SparkEntry.queries("t_span_dedup")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      "chunk removal must be a map-side broadcast anti probe:\n" + p)
  }

  test("t_span_dedup: past the count gate the removal is a shuffle anti-join, same rows") {
    // broadcastMax = 0 forces the fallback every duplicated chunk set
    // would hit on a high-duplication corpus (the ×64 rehearsal shape).
    val guarded = graft.queries.TrainPrep.spanDedup(spark, d, broadcastMax = 0L)
    val p = guarded.queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastHashJoin"),
      "past the gate nothing may broadcast the dup set:\n" + p)
    assert(p.contains("ShuffledHashJoin") && p.contains("LeftAnti"),
      "the fallback is a shuffled hash anti-join on the chunk hash:\n" + p)
    val a = guarded.collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("t_span_dedup")(spark, d).collect().map(_.toSeq).toSeq
    assert(a == b, "both physical shapes must produce identical rows")
  }

  test("t_seq_pack: shard count is a parameter; plan shape is shard-count-independent") {
    // The gate keeps 8 for oracle stability; production sizing (~4k+)
    // must keep the SAME plan: exactly one hash exchange (the shard
    // window), whatever the shard count.
    val at4096 = graft.queries.TrainPrep.seqPack(spark, d, shards = 4096)
    val p = at4096.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1,
      "exactly one hash shuffle at 4096 shards:\n" + p)
    // Invariant check at the new shard count: quotient/remainder of the
    // per-shard exclusive running sum (the same contract the gate pins).
    val rows = at4096.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.groupBy(_._2).foreach { case (_, docs) =>
      var cum = 0L
      docs.sortBy(_._1).foreach { case (id, _, tokens, packId, off) =>
        assert(packId == cum / 2048 && off == cum % 2048, s"doc $id layout at 4096 shards")
        cum += tokens
      }
    }
  }

  test("shuffle shard width is a parameter; production 16 bits = gate 10 bits, same plan") {
    // The seqPack(shards) precedent applied to the shuffle shard (r8
    // VERDICT #3): the gate keeps 10 bits for oracle stability, but at
    // 100 TB ~10 bits means ~100 GB per shard-sort — production uses
    // ~16. Both widths must agree row-for-row (shards partition the
    // key order at ANY width) and keep the one-corpus-exchange plan.
    assert(graft.queries.TrainPrep.globalShuffle(spark, d, shardBits = 16)
        .collect().toSeq ==
      graft.queries.TrainPrep.globalShuffle(spark, d).collect().toSeq,
      "globalShuffle at 16 bits must equal the 10-bit gate row-for-row")
    // plan asserts on fresh (pre-execution) frames — the same
    // measurement point as the 10-bit gate tests below
    val pGs = graft.queries.TrainPrep.globalShuffle(spark, d, shardBits = 16)
      .queryExecution.executedPlan.toString
    assert(pGs.contains("hashpartitioning(shard") &&
      "Exchange SinglePartition".r.findAllIn(pGs).size <= 1,
      "16-bit shuffle keeps the per-shard plan shape:\n" + pGs)

    assert(graft.queries.TrainPrep.trainPrep(spark, d, shardBits = 16)
        .collect().toSeq ==
      graft.queries.TrainPrep.trainPrep(spark, d).collect().toSeq,
      "trainPrep at 16 bits must equal the 10-bit gate row-for-row")
    val pTp = graft.queries.TrainPrep.trainPrep(spark, d, shardBits = 16)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(pTp).size <= 2 &&
      "Exchange SinglePartition".r.findAllIn(pTp).size <= 3,
      "16-bit trainPrep keeps the one-corpus-exchange plan shape:\n" + pTp)
  }

  test("t_global_shuffle: per-shard decomposition equals the naive global row_number") {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.TextHash.h60
    val got = SparkEntry.queries("t_global_shuffle")(spark, d)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // naive single-partition form, fine at test scale
    val naive = Tables.documents(spark, d)
      .select(col("doc_id"),
        h60(concat(lit("shuf#"), col("doc_id").cast("string"))).as("k"))
      .withColumn("pos", row_number().over(Window.orderBy(col("k"), col("doc_id"))) - 1)
      .collect().map(r => r.getLong(0) -> (r.getInt(2) - 0L)).toMap
    assert(got == naive, "two-stage rank must equal the global row_number")
    assert(got.values.toSeq.sorted == (0L until got.size).toSeq,
      "positions are a permutation of 0..n-1")
  }

  test("t_global_shuffle: the corpus-sized window rank is per-shard, not global") {
    val p = SparkEntry.queries("t_global_shuffle")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(shard"),
      "the rank window must hash-partition on the shard key:\n" + p)
    // The only SinglePartition convergence allowed is the ≤1024-row
    // offsets running sum; the corpus-sized rank stream must never
    // collapse onto one partition.
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 1,
      "only the tiny offsets window may single-partition:\n" + p)
  }

  test("pipe_train_prep: composes its three stages exactly") {
    val out = SparkEntry.queries("pipe_train_prep")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    // 1. the kept set IS t_domain_mix's keep set
    val mixKept = SparkEntry.queries("t_domain_mix")(spark, d)
      .collect().map(_.getLong(0)).toSet
    assert(out.map(_._1).toSet == mixKept)
    assert(out.length < Tables.documents(spark, d).count(), "mix drops something")
    // 2. pos is a permutation of 0..n-1 over the kept docs
    assert(out.map(_._4).sorted.toSeq == (0L until out.length).toSeq)
    // 3. packing is the running token sum in POS order
    var cum = 0L
    out.sortBy(_._4).foreach { case (id, _, tokens, _, packId, packOff) =>
      assert(packId == cum / 2048 && packOff == cum % 2048,
        s"doc $id: pack ($packId,$packOff) != cum $cum")
      cum += tokens
    }
  }

  test("pipe_train_prep: one corpus-sized exchange serves both windows") {
    val p = SparkEntry.queries("pipe_train_prep")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("hashpartitioning(shard"),
      "rank+packing windows must hash-partition on the shard key:\n" + p)
    // The rank window and the cumulative-token window share
    // partitioning AND ordering, so they must ride ONE corpus-sized
    // hash exchange (the offsets agg has its own small one).
    assert("Exchange hashpartitioning\\(shard".r.findAllIn(p).size <= 2,
      "shard exchanges: one for the shared windows, at most one for the offsets agg:\n" + p)
    // SinglePartition convergences are all BOUNDED frames: the
    // |sources|-row min-token agg (planned twice — the kept frame is
    // derived independently for the window path and the offsets path)
    // and the <=1024-row shard-offsets window. The corpus-sized
    // window stream itself must never appear under one of them —
    // pinned indirectly: the only Window over corpus rows hash-
    // partitions on shard (asserted above), and the rank window of
    // the component gate pins the same (t_global_shuffle test).
    assert("Exchange SinglePartition".r.findAllIn(p).size <= 3,
      "only the bounded agg/offsets frames may single-partition:\n" + p)
    assert(p.contains("BroadcastHashJoin"), "thresholds and offsets join broadcast:\n" + p)
  }

  test("t_domain_mix: smallest source keeps everything, sample is deterministic") {
    val docs = Tables.documents(spark, d)
    val toks = docs.groupBy(col("source"))
      .agg(sum(expr("div(n_chars + 3, 4)")).as("toks"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val minSource = toks.minBy { case (s, t) => (t, s) }._1
    val perSource = docs.groupBy(col("source")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = SparkEntry.queries("t_domain_mix")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val keptBySource = kept.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    assert(keptBySource(minSource) == perSource(minSource),
      s"the min-token source ($minSource, thr=1e6) keeps every doc")
    keptBySource.foreach { case (s, n) =>
      assert(n <= perSource(s), s"source $s cannot keep more than it has")
    }
    val again = SparkEntry.queries("t_domain_mix")(spark, d)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(kept.toSeq == again.toSeq, "hash-coin sampling is run-deterministic")
  }

  test("t_domain_mix: the threshold table joins back broadcast") {
    val p = SparkEntry.queries("t_domain_mix")(spark, d)
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the |sources|-row threshold table must broadcast:\n" + p)
  }

  test("t_chunk_overlap: stride-16/size-32 chunks tile every document") {
    val lens = Tables.documents(spark, d)
      .select(col("doc_id"), size(split(col("text"), " ")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val chunks = SparkEntry.queries("t_chunk_overlap")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(chunks.keySet == lens.keySet, "every document chunks")
    chunks.foreach { case (id, cs) =>
      val len = lens(id).toLong
      val expected = math.max(1L, math.ceil((len - 16) / 16.0).toLong)
      val ids = cs.map(_._2).sorted.toSeq
      assert(ids == (0L until expected).toSeq, s"doc $id chunk ids contiguous")
      cs.foreach { case (_, cid, nt) =>
        assert(nt >= 1 && nt <= 32, s"doc $id chunk $cid token count")
        assert(nt == math.min(32L, len - cid * 16), s"doc $id chunk $cid span")
      }
      val (lastId, lastN) = (ids.last, cs.maxBy(_._2)._3)
      assert(lastId * 16 + lastN == len, s"doc $id final chunk reaches the end")
    }
  }

  test("t_contamination_probe: broadcast on the probe side, same answer") {
    val probe = SparkEntry.queries("t_contamination_probe")(spark, d)
    val p = probe.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      "the probe-gram join must be a broadcast hash join:\n" + p)
    assert(!p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin"),
      "corpus grams must not shuffle for the overlap probe:\n" + p)
    val a = probe.collect().map(_.toSeq).toSeq
    val b = SparkEntry.queries("t_contamination")(spark, d).collect().map(_.toSeq).toSeq
    assert(a == b, "two-source broadcast form must equal the one-source form")
  }
}
