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
  *
  * CONCURRENT scopes on one session MERGE rather than race (r10
  * ADVICE): a scope that opens while another is in flight joins it —
  * the sweep runs only when the LAST overlapping scope exits, against
  * the OUTERMOST baseline, so a serve request racing a stream (or a
  * nested scope on the same thread) can never have its in-flight local
  * checkpoints unpersisted mid-computation (local checkpoints cannot
  * be recomputed — a mid-flight sweep is unrecoverable, whereas the
  * deferred sweep merely delays reclamation until the overlap ends).
  * A blocking lock would be the alternative, but a stream holding the
  * session lock through `awaitTermination` while its own foreachBatch
  * thread needs a scope would deadlock — merging is the shape that
  * composes with Structured Streaming.
  */
object CheckpointHygiene {

  /** Per-session overlap state: open-scope depth + the outermost
    * scope's baseline. Weakly keyed so dead sessions drop their
    * entry. */
  private final class State {
    var depth: Int = 0
    var baseline: Set[Int] = null
    var blocking: Boolean = false
  }

  private val states = new java.util.WeakHashMap[SparkSession, State]()

  private def stateFor(spark: SparkSession): State = states.synchronized {
    var s = states.get(spark)
    if (s == null) { s = new State; states.put(spark, s) }
    s
  }

  /** Run `body`, then unpersist every RDD persisted during it (see the
    * object doc for the caller contract and the overlapping-scope
    * merge). `blocking` = wait for block removal before returning —
    * pass true when the next statement is latency-sensitive (the Bench
    * lesson: async removal races the next round's execution and spikes
    * its tail); when scopes merge, any member requesting blocking
    * makes the final sweep blocking. */
  def scoped[A](spark: SparkSession, blocking: Boolean = false)(body: => A): A = {
    val st = stateFor(spark)
    st.synchronized {
      if (st.depth == 0) {
        st.baseline = spark.sparkContext.getPersistentRDDs.keySet.toSet
        st.blocking = false
      }
      st.depth += 1
      if (blocking) st.blocking = true
    }
    try body
    finally {
      // The doomed set is SNAPSHOTTED inside the lock at the depth-0
      // transition: a scope that opens after the lock releases takes a
      // baseline that still CONTAINS these ids (they are unpersisted
      // below, outside the lock), and its own new checkpoints get ids
      // not in this snapshot — so a racing opener's in-flight blocks
      // can never be swept, which enumerating getPersistentRDDs after
      // releasing the lock would not guarantee.
      val sweep = st.synchronized {
        st.depth -= 1
        if (st.depth == 0) {
          val doomed = spark.sparkContext.getPersistentRDDs.toList
            .filter { case (id, _) => !st.baseline.contains(id) }
          st.baseline = null
          Some((doomed, st.blocking))
        } else None
      }
      sweep.foreach { case (doomed, block) =>
        doomed.foreach { case (_, rdd) => rdd.unpersist(block) }
      }
    }
  }
}
