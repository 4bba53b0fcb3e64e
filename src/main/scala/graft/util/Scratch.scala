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
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(key.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    s"${prefix}_${sane}_$digest"
  }

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

  /** Stable data directory for `tableName`, created on demand. */
  def dir(tableName: String): String = {
    val base = Paths.get(sys.props("user.dir"), "target", "graft_scratch")
    Files.createDirectories(base)
    base.resolve(tableName).toString
  }
}
