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
}
