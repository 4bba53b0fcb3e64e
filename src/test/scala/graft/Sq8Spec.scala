package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The SQ8 two-stage ANN contract (`ann_sq8`): int8 scalar codes rank
  * the corpus exactly (integer arithmetic carried in doubles — every
  * intermediate < 2²¹, so the codegen fold is exact in any order), the
  * float rerank touches only the candidate pool, and the quantized
  * route recovers the exact brute-force neighbors on the gate corpus. */
class Sq8Spec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def result = SparkEntry.queries("ann_sq8")(spark, d)

  test("stage-1 code dot is exact integer arithmetic (fold == widened integer dot)") {
    graft.functions.DotProduct.register(spark)
    val coded = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
      .withColumn("c", transform(col("v"), x => floor(x * 127.0 + 0.5).cast("double")))
      .limit(40).localCheckpoint()
    val pairs = coded.as("a").crossJoin(coded.as("b"))
      .select(
        expr("graft_dot(a.c, b.c)").cast("long").as("fold"),
        aggregate(zip_with(col("a.c"), col("b.c"),
            (x, y) => (x * y).cast("long")),
          lit(0L), (acc, x) => acc + x).as("intdot"))
    assert(pairs.filter(col("fold") =!= col("intdot")).count() == 0)
  }

  test("exactly K ranked rows per query, cosines non-increasing within a query") {
    val rows = result.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(4)).toSeq.sorted == (1 to 10))
      val cos = rs.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse)
    }
  }

  test("stage 1 reads ONLY the persisted code column — no scan in the candidate plan touches v") {
    // r12 VERDICT #2: the int8 codes are PERSISTED in the IVF vector
    // table (derived once at build/append/retrain), so the serving
    // fleet's hot path never scans float vectors. The query frame is
    // checkpointed, so the candidate plan's only file scan is the
    // corpus code read — pin that it reads the stored tinyint codes
    // and never the float column.
    val cands = graft.queries.Ann.sq8CandStageFor(spark, d, 50,
      prune = false, queryPred = col("vec_id") >= 10 && col("vec_id") < 15)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("c:array<tinyint>"),
      s"stage 1 must read the persisted tinyint code column:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("composed ann_ivf_sq8 stage 1: bucket-pruned AND code-only scan") {
    val cands = graft.queries.Ann.sq8CandStageFor(spark, d, 50,
      prune = true, queryPred = col("vec_id") >= 15 && col("vec_id") < 20)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"the quantized rank must scan only the probed IVF buckets:\n$plan")
    assert(plan.contains("c:array<tinyint>"),
      s"stage 1 must read the persisted tinyint code column:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("composed ann_ivf_sq8: K ranked rows per query, cosines non-increasing") {
    val df = SparkEntry.queries("ann_ivf_sq8")(spark, d)
    val rows = df.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 5)
    byQ.foreach { case (_, rs) =>
      assert(rs.map(_.getInt(4)).toSeq.sorted == (1 to 10))
      val cos = rs.sortBy(_.getInt(4)).map(_.getDouble(3)).toSeq
      assert(cos == cos.sorted.reverse)
    }
  }

  test("recall@10 vs exact brute force on the gate corpus") {
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
      .localCheckpoint()
    val q = e.filter(col("vec_id") >= 10 && col("vec_id") < 15)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("vec_id"))
    val exact = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"), expr("graft_dot(qv, v)").as("cosine"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sq8 = result.select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (sq8 & exact).size.toDouble / exact.size
    // int8 on normalized 64-dim vectors with a 50-candidate rerank
    // pool is near-lossless; anything below 0.9 means the quantized
    // stage stopped ranking like the float space.
    assert(recall >= 0.9, s"recall@10 $recall")
  }
}
