package graft.util

import org.apache.spark.sql.SparkSession

/** Checkpoint-block hygiene for long-lived sessions.
  *
  * Several query bodies materialize intermediate frames via
  * `localCheckpoint` so a stage shared by two consumers runs once
  * (`d_exact_dedup`'s digest frame, `pipe_corpus_clean`'s hash stage,
  * the incremental ledger's probe output, `DigestIndex.probe`). Those
  * frames feed the RETURNED lazy DataFrame, so the library cannot free
  * them before the caller materializes the result — and Spark's async
  * ContextCleaner only reaps them after a driver GC notices, so a
  * long-lived session (a serve loop, a notebook) accumulates dead
  * blocks per invocation until LIVE working sets get evicted to disk
  * (the measured round-7/9 block-manager-pressure failure mode).
  *
  * The caller contract, packaged: wrap each fully-materializing
  * invocation in [[scoped]] —
  *
  * {{{
  * val rows = CheckpointHygiene.scoped(spark) {
  *   Dedup.queries("d_exact_dedup")(spark, dir).collect()
  * }
  * }}}
  *
  * `scoped` snapshots the persisted-RDD id set, runs the body, and
  * unpersists every RDD persisted DURING the body that the snapshot
  * did not contain — exactly the per-round orphan discipline
  * `graft.Bench` and `IncrDeltaProbe` run. The body must CONSUME its
  * result (collect/write/count): frames that escape the scope lose
  * their checkpoint blocks and cannot be recomputed. Long-lived frames
  * built inside the scope on purpose (a first `Dedup.incrIndex` call
  * caching the session index) are persisted TABLES, not RDD blocks,
  * and are unaffected.
  */
object CheckpointHygiene {

  /** Run `body`, then unpersist every RDD persisted during it (see the
    * object doc for the caller contract). `blocking` = wait for block
    * removal before returning — pass true when the next statement is
    * latency-sensitive (the Bench lesson: async removal races the next
    * round's execution and spikes its tail). */
  def scoped[A](spark: SparkSession, blocking: Boolean = false)(body: => A): A = {
    val baseline = spark.sparkContext.getPersistentRDDs.keySet
    try body
    finally spark.sparkContext.getPersistentRDDs.foreach { case (id, rdd) =>
      if (!baseline.contains(id)) rdd.unpersist(blocking)
    }
  }
}
