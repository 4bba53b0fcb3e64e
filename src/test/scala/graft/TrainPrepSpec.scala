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
