package graft

import org.apache.spark.sql.functions._

import graft.functions.{DotProduct, LangHits, LangId, VectorOps}

/** The native codegen dot-product expression must be bit-identical to
  * the declarative fold (same accumulation order) and survive codegen
  * compilation inside a real plan. */
class CodegenSpec extends SparkSuite {

  test("graft_dot matches the declarative fold bit-for-bit") {
    DotProduct.register(spark)
    val e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
      .limit(50)
    val both = e.as("a").crossJoin(e.as("b"))
      .select(
        expr("graft_dot(a.v, b.v)").as("native"),
        VectorOps.dot(col("a.v"), col("b.v")).as("fold"))
      .collect()
    assert(both.nonEmpty)
    both.foreach { r =>
      assert(java.lang.Double.compare(r.getDouble(0), r.getDouble(1)) == 0)
    }
  }

  test("graft_lang_hits matches the Scala reference classifier counts") {
    LangHits.register(spark)
    import spark.implicits._
    val texts = Seq("", "a", "1234 !!!", "the cat and the hat sat",
      "der schnelle braune fuchs und der hund", "la casa de la colina que",
      "les chats et les chiens de la maison",
      // supplementary-plane letters (\p{L} keeps them): each must count
      // as ONE window element — code points, not UTF-16 units
      "the 𝒜𝒞𝒟 cat and the 𝒻 hat",
      "𝒜𝒞") ++
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("text").as[String].take(100)
    val rows = texts.toDF("text")
      .withColumn("norm", concat(lit(" "),
        trim(regexp_replace(lower(col("text")), "[^\\p{L}]+", " ")), lit(" ")))
      .withColumn("hits", expr("graft_lang_hits(norm)"))
      .select("text", "hits").collect()
    assert(rows.length == texts.length)
    rows.foreach { r =>
      // Reference: the driver-side classifier's own trigram stream.
      val tg = LangId.trigrams(r.getString(0))
      val expected = tg.size.toLong +:
        LangId.profiles.map { case (_, prof) => tg.count(prof.contains).toLong }
      assert(r.getSeq[Long](1) == expected,
        s"mismatch for '${r.getString(0).take(40)}'")
    }
  }

  test("graft_lang_hits handles null input") {
    LangHits.register(spark)
    val r = spark.sql(
      "SELECT graft_lang_hits(CAST(NULL AS STRING)) AS n").collect().head
    assert(r.isNullAt(0))
  }

  test("graft_dot works from SQL and handles nulls") {
    DotProduct.register(spark)
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d, " +
        "graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS n").collect().head
    assert(r.getDouble(0) == 32.0)
    assert(r.isNullAt(1))
  }
}
