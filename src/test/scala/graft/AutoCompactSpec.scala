package graft

import org.apache.spark.sql.functions._

import graft.queries.{DigestIndex, IndexMaintenance}

/** The auto-compaction cadence (`[scale] compact_every_appends`): off
  * by default (gates and the other index specs run with appends
  * accumulating files, as before), and when set, append() compacts the
  * base table after every N appends WITHOUT changing any probe result
  * — the caller's "use the returned instance" contract carries the
  * fresh generation back. Branch overlays are exempt (their appends
  * never touch the base). */
class AutoCompactSpec extends SparkSuite {

  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private def probeRows(idx: DigestIndex.Index, delta: org.apache.spark.sql.DataFrame) =
    idx.probe(delta).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2))).toSeq

  private val corpus = docs(1L -> "alpha beta gamma", 2L -> "delta epsilon zeta")
  private val delta = docs(10L -> "alpha beta gamma", 20L -> "nothing like it")

  test("off by default: appends never change the generation") {
    assert(IndexMaintenance.compactEveryAppends == 0)
    val idx = DigestIndex.fresh(spark, "ac_off", corpus)
    try {
      val after = idx.append(docs(3L -> "eta theta iota"))
      assert(after eq idx, "with the knob off, append must return the same handle")
    } finally idx.drop()
  }

  test("appends auto-compact at the cadence; probes invariant across the boundary") {
    IndexMaintenance.compactEveryAppends = 2
    try {
      val base = DigestIndex.fresh(spark, "ac_on", corpus)
      val i1 = base.append(docs(3L -> "eta theta iota"))
      assert(i1 eq base, "first append (tick 1 of 2) must not compact")
      val before = probeRows(i1, delta)
      val i2 = i1.append(docs(4L -> "kappa lambda mu"))
      assert(i2 ne i1, "second append (tick 2 of 2) must hand back the compacted generation")
      assert(i2.tableName != base.tableName, "a fresh generation table")
      // probe invariance across the auto-compact boundary: same
      // verdicts, and the content appended in BOTH ticks is present
      assert(probeRows(i2, delta) == before)
      assert(probeRows(i2, docs(40L -> "kappa lambda mu")).head._3,
        "content appended in the compacting tick must be discoverable")
      // the pre-compaction handle fails fast, per the stale contract
      val e = intercept[IllegalStateException] { i1.probe(delta).collect() }
      assert(e.getMessage.contains("stale DigestIndex handle"))
      i2.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("branch overlays never auto-compact") {
    IndexMaintenance.compactEveryAppends = 1
    try {
      val base = DigestIndex.fresh(spark, "ac_branch", corpus)
      val br = base.branch()
      try {
        val after = br.append(docs(5L -> "nu xi omicron"))
        assert(after eq br, "a branch append must never trigger base compaction")
        assert(probeRows(base, delta).nonEmpty, "base handle still current")
      } finally br.drop()
      base.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  // Per-class cadence smokes (round 11): the appendTick hook is wired
  // by hand in each of the five persisted indexes (the SURVEY §9.10
  // base-trait item), so each wiring gets its own rotation check —
  // cadence 1, one append, the returned handle must carry a fresh
  // generation with the appended content discoverable.

  test("MinhashIndex append auto-compacts at the cadence") {
    import spark.implicits._
    IndexMaintenance.compactEveryAppends = 1
    try {
      val base = graft.queries.MinhashIndex.fresh(spark, "ac_mh",
        Seq(1L -> "alpha beta gamma delta epsilon zeta eta theta")
          .toDF("doc_id", "text"))
      val after = base.append(
        Seq(2L -> "iota kappa lambda mu nu xi omicron pi").toDF("doc_id", "text"))
      assert(after ne base, "the cadence must rotate the generation")
      assert(after.tableName != base.tableName)
      val hit = after.probe(
        Seq(10L -> "iota kappa lambda mu nu xi omicron pi").toDF("doc_id", "text"))
        .filter(col("dup_of") === 2L).count()
      assert(hit == 1, "content appended in the compacting tick is discoverable")
      after.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("EmbedIndex append auto-compacts at the cadence") {
    import spark.implicits._
    IndexMaintenance.compactEveryAppends = 1
    def oneHot(i: Int): Array[Float] =
      Array.tabulate(64)(j => if (j == i) 1.0f else 0.0f)
    try {
      val base = graft.queries.EmbedIndex.fresh(spark, "ac_em",
        Seq((1L, oneHot(0))).toDF("vec_id", "embedding"))
      val after = base.append(Seq((2L, oneHot(5))).toDF("vec_id", "embedding"))
      assert(after ne base, "the cadence must rotate the generation")
      assert(after.tableName != base.tableName)
      val hit = after.probe(Seq((10L, oneHot(5))).toDF("vec_id", "embedding"))
        .filter(col("dup_of") === 2L).count()
      assert(hit == 1, "content appended in the compacting tick is discoverable")
      after.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("IvfIndex append auto-compacts at the cadence") {
    import spark.implicits._
    IndexMaintenance.compactEveryAppends = 1
    def oneHot(i: Int): Seq[Double] = Seq.tabulate(64)(j => if (j == i) 1.0 else 0.0)
    try {
      val base = graft.queries.IvfIndex.fresh(spark, "ac_ivf",
        (0L until 4L).map(i => (i, oneHot((i % 2).toInt))).toDF("vec_id", "v"),
        numCentroids = 2, iters = 1, quantScale = 1000000.0)
      val after = base.append(Seq((10L, oneHot(0))).toDF("vec_id", "v"))
      assert(after ne base, "the cadence must rotate the generation")
      assert(after.tableName != base.tableName)
      assert(after.assigned.count() == 5, "appended vector present post-compact")
      after.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("PostingsIndex append auto-compacts at the cadence") {
    import spark.implicits._
    IndexMaintenance.compactEveryAppends = 1
    try {
      val base = graft.search.PostingsIndex.of(
        Seq(1L -> "alpha beta gamma").toDF("doc_id", "text"),
        "doc_id", "text", "ac_po")
      val after = base.append(
        Seq(2L -> "delta epsilon zeta").toDF("doc_id", "text"), "doc_id", "text")
      assert(after ne base, "the cadence must rotate the generation")
      assert(after.tableName != base.tableName)
      assert(after.nDocs == 2 &&
        after.postings.filter(col("term") === "delta").count() > 0,
        "appended content present post-compact")
      after.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("the cadence fires exactly once per window under concurrent ticks") {
    // r11 ADVICE: check-then-set let two concurrent appends both
    // observe the threshold and race two generation rotations on the
    // same _gN+1 name, and ticks landing between the check and the
    // reset were lost. The atomic wrap makes the count exact under any
    // interleaving: 300 ticks at cadence 3 fire exactly 100 times.
    IndexMaintenance.compactEveryAppends = 3
    try {
      val key = "ac_atomic_" + java.util.UUID.randomUUID().toString.take(8)
      val fires = new java.util.concurrent.atomic.AtomicInteger(0)
      val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
      try {
        val tasks = (1 to 300).map { _ =>
          pool.submit(new Runnable {
            def run(): Unit =
              if (IndexMaintenance.appendTick(key)) fires.incrementAndGet()
          })
        }
        tasks.foreach(_.get(30, java.util.concurrent.TimeUnit.SECONDS))
        assert(fires.get() == 100,
          s"300 ticks at cadence 3 must fire exactly 100 times, got ${fires.get()}")
      } finally pool.shutdown()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("a manual compact restarts the auto-compaction window") {
    // resetAppend: without it a manual compaction mid-window would be
    // followed by a premature auto-compaction on the next append.
    IndexMaintenance.compactEveryAppends = 2
    try {
      val base = DigestIndex.fresh(spark, "ac_reset", corpus)
      val i1 = base.append(docs(3L -> "eta theta iota")) // tick 1 of 2
      assert(i1 eq base)
      val i2 = i1.compact() // manual: window restarts
      val i3 = i2.append(docs(4L -> "kappa lambda mu")) // tick 1 of the NEW window
      assert(i3 eq i2, "the append after a manual compact must not auto-compact")
      val i4 = i3.append(docs(5L -> "nu xi omicron")) // tick 2: fires
      assert(i4 ne i3, "the cadence still fires at the restarted window's end")
      i4.drop()
    } finally IndexMaintenance.compactEveryAppends = 0
  }

  test("the [scale] compact_every_appends knob reaches the runtime") {
    val root = java.nio.file.Files.createTempDirectory("graft_ac_cfg")
    java.nio.file.Files.writeString(
      root.resolve(graft.config.Config.ConfigFilename),
      "[scale]\ncompact_every_appends = 7\n")
    val cfg = graft.config.Config.load(root)
    assert(cfg.scale.compactEveryAppends == 7)
    try {
      IndexMaintenance.configure(cfg)
      assert(IndexMaintenance.compactEveryAppends == 7)
    } finally IndexMaintenance.compactEveryAppends = 0
  }
}
