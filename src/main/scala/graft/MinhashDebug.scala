import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.TextHash._
object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = graft.Tables.configure(SparkSession.builder())
      .master("local[32]").config("spark.sql.shuffle.partitions","32")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val sh = graft.Tables.documents(spark, d)
      .select(col("doc_id"), explode(shingles(tokens(col("text")), 3)).as("s"))
      .withColumn("hm", h60(col("s")) % P)
    println(s"shingle rows: ${sh.count()}")
    val sigCols = (0 until 32).map(i => min(minhashPerm(col("hm"), i)).as(s"m$i"))
    val sig = sh.groupBy("doc_id").agg(sigCols.head, sigCols.tail: _*).cache()
    println(s"docs: ${sig.count()}")
    val bands = (0 until 16).map { b =>
      val key = concat_ws("_", lit(b) +: (0 until 2).map(r => col(s"m${b*2+r}")): _*)
      sig.select(col("doc_id"), key.as("band_key"))
    }.reduce(_ union _)
    val bandSizes = bands.groupBy("band_key").count().orderBy(col("count").desc)
    bandSizes.show(5, false)
    val cands = bands.as("x").join(bands.as("y"),
      col("x.band_key") === col("y.band_key") && col("x.doc_id") < col("y.doc_id"))
      .select(col("x.doc_id").as("doc_a"), col("y.doc_id").as("doc_b")).distinct()
    println(s"candidate pairs: ${cands.count()}")
    spark.stop()
  }
}
