package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the driver-provided star schema (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Keep reads lazy and
  * column-pruned: callers `select` what they need so Catalyst pushes
  * projection/predicates into the parquet scan — at 100 TB the scan is
  * the dominant cost and pruning is the first-order optimization.
  */
object Tables {
  def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String)    = t(s, d, "region")
  def nation(s: SparkSession, d: String)    = t(s, d, "nation")
  def customer(s: SparkSession, d: String)  = t(s, d, "customer")
  def supplier(s: SparkSession, d: String)  = t(s, d, "supplier")
  def part(s: SparkSession, d: String)      = t(s, d, "part")
  def orders(s: SparkSession, d: String)    = t(s, d, "orders")
  def lineitem(s: SparkSession, d: String)  = t(s, d, "lineitem")
  def events(s: SparkSession, d: String)    = t(s, d, "events")
  def documents(s: SparkSession, d: String) = t(s, d, "documents")
  def embeddings(s: SparkSession, d: String) = t(s, d, "embeddings")
}
