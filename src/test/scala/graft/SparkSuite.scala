package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared warm session + ingested fixture catalog for all suites. */
trait SparkSuite extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSuite.spark

  def fixturePath(name: String): String =
    getClass.getResource(s"/fixtures/$name").getPath
}

object SparkSuite {
  lazy val spark: SparkSession = Tables.configure(SparkSession.builder())
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft_wh").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  /** Fixture catalog ingested once and shared (read-only) by suites. */
  lazy val catalog: graft.model.Catalog = {
    spark.sparkContext.setLogLevel("WARN")
    graft.ingest.ManifestReader.read(spark,
      getClass.getResource("/fixtures/manifest.json").getPath)
  }
}
