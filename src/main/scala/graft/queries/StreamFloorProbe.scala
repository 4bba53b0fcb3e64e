package graft.queries

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.Tables

/** Decomposition of the streaming gates' ~1.3–2 s AvailableNow replay
  * floor (r15 VERDICT #7: "measure whether one shared AvailableNow
  * session amortizes the floor before accepting 'no local-mode action'
  * again"). Each st_* gate starts a FRESH streaming query inside its
  * timed region, so the question is what that start costs when the
  * operators do nothing at all:
  *
  *   - `noop_stream`: readStream(events) → select(event_id) → memory
  *     sink, AvailableNow — the irreducible per-query machinery
  *     (offset log + commit log setup, microbatch planning, one
  *     microbatch, sink). If this costs ~the gate floor, the floor is
  *     the STREAM START, not our operators, and no shared-session
  *     shape can remove it without merging the four gates into one
  *     stream — which would change what each gate computes (the gates
  *     are four distinct sinks with distinct operator state).
  *   - `batch_equiv`: the same projection as a plain batch job — the
  *     scheduling floor a non-streaming query pays for the same scan.
  *   - `st_window_daily`: the real gate, for scale.
  *
  * Prints one JSON line (`STREAM_FLOOR.json` via redirection).
  *
  *   SPARK_GRAFT_SF_DIR=<dir> sbt "runMain graft.queries.StreamFloorProbe"
  */
object StreamFloorProbe {
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

    val seq = new java.util.concurrent.atomic.AtomicInteger(0)
    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def p50(xs: Seq[Double]): Double = graft.Bench.percentile(xs, 50)

    def noopStream(): Unit = {
      val sink = s"floor_noop_${seq.incrementAndGet()}"
      val q = graft.streaming.EventStreams.rawEventStream(spark, sfDir)
        .select(col("event_id"))
        .writeStream.format("memory").queryName(sink)
        .outputMode(OutputMode.Append())
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table(sink).queryExecution.toRdd.count()
      ()
    }
    def batchEquiv(): Unit = {
      Tables.events(spark, sfDir).select(col("event_id"))
        .queryExecution.toRdd.count()
      ()
    }
    def gate(): Unit = {
      graft.SparkEntry.queries("st_window_daily")(spark, sfDir)
        .queryExecution.toRdd.count()
      ()
    }

    // warmups
    noopStream(); batchEquiv(); gate()
    val noop = (1 to rounds).map(_ => time(noopStream()))
    val batch = (1 to rounds).map(_ => time(batchEquiv()))
    val g = (1 to rounds).map(_ => time(gate()))
    def fmt(v: Double) = f"$v%.3f"
    println(s"""{"metric":"stream_floor","sf":"$sfDir","rounds":$rounds,""" +
      s""""noop_stream_p50_sec":${fmt(p50(noop))},""" +
      s""""batch_equiv_p50_sec":${fmt(p50(batch))},""" +
      s""""st_window_daily_p50_sec":${fmt(p50(g))},""" +
      s""""noop_stream_all":[${noop.map(fmt).mkString(",")}],""" +
      s""""batch_equiv_all":[${batch.map(fmt).mkString(",")}]}""")
    spark.stop()
  }
}
