package graft

import org.apache.spark.sql.functions._

import graft.functions.BandKeys
import graft.queries.EmbedIndex

/** The native `graft_bands` kernel must emit BIT-EQUAL packed keys to
  * the case-when column formula it replaced (kept as
  * [[EmbedIndex.packedKeyCols]] for exactly this pin), across the gate
  * and production geometries — the formula is the semantics, the
  * kernel is the codegen-safe implementation (the formula's generated
  * Java blew Janino's 64 KB method limit past ~4 rotations × 16-bit
  * and silently fell back to interpreted execution on every embed-band
  * build/probe/append stage; r13 VERDICT #3). */
class BandKeysSpec extends SparkSuite {

  private lazy val vecs = {
    BandKeys.register(spark)
    spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
      .limit(64)
      .localCheckpoint()
  }

  test("graft_bands ≡ the column formula at 8/16-bit × R = 1..16") {
    for (bandBits <- Seq(8, 16); rotations <- 1 to 16) {
      val rows = vecs.select(
          expr(s"graft_bands(v, $bandBits, $rotations)").as("kernel"),
          array(EmbedIndex.packedKeyCols(bandBits, rotations): _*).as("formula"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"mismatch at bandBits=$bandBits rotations=$rotations")
      }
    }
  }

  test("graft_bands at wide geometry (32-bit) and full rotations stays equal") {
    val rows = vecs.select(
        expr("graft_bands(v, 32, 16)").as("kernel"),
        array(EmbedIndex.packedKeyCols(32, 16): _*).as("formula"))
      .collect()
    rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1)))
  }

  test("graft_bands rejects bad geometry at analysis time") {
    val ex = intercept[Exception] {
      vecs.select(expr("graft_bands(v, 7, 4)")).collect()
    }
    assert(ex.getMessage.contains("graft_bands"))
  }
}
