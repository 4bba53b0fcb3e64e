package graft.util

import java.util.concurrent.ConcurrentLinkedQueue

import scala.jdk.CollectionConverters._

/** Process-wide record of one-time index builds (postings / IVF /
  * MinHash). Exists because a corpus-sized build landing INSIDE a
  * measured bench round is indistinguishable, in the bench artifact,
  * from a slow probe: round 7's committed bench recorded `o2_bm25_topk`
  * p50 at 1.75 s (≈ probe + postings build) while a same-protocol local
  * recording showed 0.22 s (probe only), and nothing in either artifact
  * said which rounds paid a build. Every `*.of()` cache-miss build now
  * registers here with its wall-clock cost; [[graft.Bench]] drains the
  * log per query and emits a `"builds"` map in the bench JSON, so the
  * artifact itself says whether a measured round paid a build.
  */
object BuildLog {

  final case class Event(what: String, seconds: Double)

  private val events = new ConcurrentLinkedQueue[Event]()

  /** Time `body`, record it as a build of `what`, and log one stderr
    * line — builds are rare, one-per-corpus events; the line is the
    * cheapest cross-check when an artifact looks wrong. */
  def timed[T](what: String)(body: => T): T = {
    val t0 = System.nanoTime()
    val r = body
    val sec = (System.nanoTime() - t0) / 1e9
    events.add(Event(what, sec))
    System.err.println(f"[graft-build] $what%s ${sec}%.3f s")
    r
  }

  /** Drain-and-return everything recorded since the last call. */
  def drain(): Seq[Event] = {
    val out = Seq.newBuilder[Event]
    var e = events.poll()
    while (e != null) { out += e; e = events.poll() }
    out.result()
  }
}
