package graft.util

import java.nio.file.{Files, Paths}

/** Stable on-disk scratch space for persisted index tables
  * ([[graft.search.PostingsIndex]], [[graft.queries.IvfIndex]]).
  *
  * Previous builds used a fresh `Files.createTempDirectory` per build,
  * which accumulated orphaned parquet under /tmp across JVM runs
  * (ADVICE r4). Instead each table gets a FIXED path under the repo's
  * `target/graft_scratch/` keyed by its (hash-disambiguated) table
  * name: successive runs overwrite in place, so disk use is bounded by
  * the live table set and `sbt clean` reclaims everything.
  */
object Scratch {

  /** Catalog-safe table name for `prefix` + corpus `key`: sanitized for
    * readability plus an 8-hex digest of the RAW key, so two distinct
    * corpus paths that sanitize identically (e.g. `/a/b` vs `/a_b`)
    * can never collide on table name and clobber each other's data. */
  def tableName(prefix: String, key: String): String = {
    val sane = key.replaceAll("[^A-Za-z0-9]+", "_").take(64)
    val digest = md5hex(key, 8)
    s"${prefix}_${sane}_$digest"
  }

  /** Session-scoped variant: appends an 8-hex digest of the session id,
    * so two concurrent JVMs (or two sessions in one JVM) building the
    * same corpus key write to DISJOINT tables/paths instead of
    * overwriting each other mid-read (ADVICE r5). The per-session dirs
    * are deleted by [[dir]]'s shutdown hook; a killed JVM's orphans are
    * reclaimed by `sbt clean`. */
  def tableName(spark: org.apache.spark.sql.SparkSession,
      prefix: String, key: String): String =
    tableName(prefix, key) + "_s" + md5hex(sessionId(spark), 8)

  def md5hex(s: String, hexChars: Int): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      .take(hexChars)

  // Guaranteed-unique id per live SparkSession (classic SparkSession
  // exposes no public sessionUUID): a weakly-keyed UUID map, so ids are
  // never reused even if a GC'd session's identityHashCode is.
  private val sessionIds =
    new java.util.WeakHashMap[org.apache.spark.sql.SparkSession, String]()

  def sessionId(spark: org.apache.spark.sql.SparkSession): String =
    sessionIds.synchronized {
      var id = sessionIds.get(spark)
      if (id == null) {
        id = java.util.UUID.randomUUID().toString
        sessionIds.put(spark, id)
      }
      id
    }

  /** Stable data directory for `tableName`, created on demand.
    * Every dir handed out is registered for recursive deletion at JVM
    * exit, so session-scoped scratch does not accumulate across runs
    * (kill -9 orphans are bounded by `target/` and reclaimed by
    * `sbt clean`). */
  def dir(tableName: String): String = {
    val base = Paths.get(sys.props("user.dir"), "target", "graft_scratch")
    Files.createDirectories(base)
    val d = base.resolve(tableName)
    issued.synchronized { issued += d }
    d.toString
  }

  /** Recursively delete `tableName`'s scratch dir NOW (compaction drops
    * the previous generation's files once the rewrite is committed). */
  def delete(tableName: String): Unit = {
    val d = Paths.get(sys.props("user.dir"), "target", "graft_scratch")
      .resolve(tableName)
    deleteRecursively(d)
    issued.synchronized { issued -= d }
  }

  private val issued = scala.collection.mutable.Set[java.nio.file.Path]()

  private def deleteRecursively(d: java.nio.file.Path): Unit =
    if (Files.exists(d)) {
      import scala.jdk.CollectionConverters._
      Files.walk(d).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.deleteIfExists(_))
    }

  Runtime.getRuntime.addShutdownHook(new Thread(() =>
    issued.synchronized { issued.foreach(deleteRecursively) }))
}
