package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Delta-scaling probe for the persisted indexes — the claim behind
  * every `*_incr_*` operator is "cost scales with the DELTA, the
  * corpus is a constant": this main measures it directly by building
  * the indexes ONCE over a fixed corpus and running geometrically
  * growing delta slices through (a) the bare MinHash probe and (b) the
  * COMPOSED cleaning ledger (`pipe_incr_clean`'s body: digest-index
  * membership + MinHash probe + quality/language — the pipeline a user
  * actually runs per batch, r8 VERDICT #7), p50 of several fully
  * materialized rounds each.
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.IncrDeltaProbe"
  *
  * Prints one JSON line: corpus size, untimed build seconds, and
  * (delta_docs → probe p50/max + ledger p50/max seconds) per slice. A
  * flat-ish curve in delta (and NO term growing with the corpus) is
  * the pass criterion; the complement — corpus-size scaling at a fixed
  * delta fraction — is `d_incr_indexed`'s column in SURVEY §9.12.
  */
object IncrDeltaProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val rounds = sys.env.getOrElse("SPARK_GRAFT_PROBE_ROUNDS", "5").toInt
    val spark = Tables.configure(SparkSession.builder())
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def mat(df: DataFrame): Long = df.queryExecution.toRdd.count()
    def timeOnce(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // Fixed corpus = the standing 90% cohort (the d_incr_* convention).
    val t0 = System.nanoTime()
    val idx = Dedup.incrIndex(spark, sfDir)
    mat(idx.bands.groupBy().count())
    val dgIdx = Dedup.digestIndex(spark, sfDir)
    mat(dgIdx.digests.groupBy().count())
    val buildSec = (System.nanoTime() - t0) / 1e9
    val corpusDocs = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) =!= 0).count()

    // Delta slices: geometric sizes out of the delta cohort, selected
    // by doc_id order so each slice is a deterministic prefix.
    val deltaAll = Tables.documents(spark, sfDir)
      .filter(pmod(col("doc_id"), lit(10)) === 0)
      .select(col("doc_id"), col("text"))
    val deltaTotal = deltaAll.count()
    val sizes = Iterator.iterate(100L)(_ * 4).takeWhile(_ < deltaTotal).toSeq :+ deltaTotal

    val results = sizes.map { n =>
      val slice = deltaAll.orderBy(col("doc_id")).limit(n.toInt)
        .repartition(cpus.toInt).localCheckpoint()
      def timedRounds(body: => Unit): Seq[Double] = {
        timeOnce { body } // warmup
        (1 to rounds).map { _ =>
          val baseline = spark.sparkContext.getPersistentRDDs.keySet
          val t = timeOnce { body }
          spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
            if (!baseline.contains(id)) rdd.unpersist(blocking = true)
          }
          t
        }.sorted
      }
      val ts = timedRounds { mat(idx.probe(slice)) }
      val tl = timedRounds { mat(CorpusClean.incrLedger(spark, slice, dgIdx, idx)) }
      // The slice's checkpoint blocks are dead once its rounds end —
      // drop them before the next (bigger) slice so sizes don't tax
      // each other through block-manager pressure (the Bench lesson).
      // Dataset.unpersist is a no-op on a localCheckpoint'd frame (it
      // only uncaches CacheManager entries), so free the underlying
      // checkpoint RDD directly (r8 ADVICE).
      Dedup.freeCheckpoint(slice)
      System.gc()
      Thread.sleep(200)
      System.err.println(
        s"[delta-probe] n=$n probe_p50=${ts(ts.length / 2)} ledger_p50=${tl(tl.length / 2)}")
      (n, ts(ts.length / 2), ts.last, tl(tl.length / 2), tl.last)
    }

    def f(v: Double) = f"$v%.3f"
    val rows = results
      .map { case (n, p50, worst, lp50, lworst) =>
        s"""{"delta_docs":$n,"p50_sec":${f(p50)},"max_sec":${f(worst)},""" +
          s""""ledger_p50_sec":${f(lp50)},"ledger_max_sec":${f(lworst)}}""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"incr_delta_scaling","corpus_docs":$corpusDocs,""" +
      s""""index_build_sec":${f(buildSec)},"rounds":$rounds,"deltas":$rows,""" +
      s""""protocol":"p50 of $rounds rounds, warm, full materialization (toRdd), per-round orphan unpersist, local[$cpus]; probe = MinhashIndex.probe, ledger = pipe_incr_clean body (digest + minhash + quality)","sf":"$sfDir"}""")
    spark.stop()
  }
}
