package graft

import org.apache.spark.sql.functions._

/** The product-quantization ANN contract (`ann_pq`): 16 subspaces ×
  * 4 dims with 16-centroid codebooks (16 4-bit codes/vector — 8
  * packed bytes), integer-quantized ADC stage 1 over the STORED code
  * column, exact-float rerank — and the whole stage-1 scoring pass
  * stays broadcast-only (no shuffle join anywhere in the plan). */
class AnnPqSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private lazy val result =
    SparkEntry.queries("ann_pq")(spark, d).localCheckpoint()

  test("exactly K ranked rows per query, cosines non-increasing within a query") {
    val rows = result.collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(20L, 21L, 22L, 23L, 24L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to 10), s"ranks for $q")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"cosine order for $q")
      assert(!rs.exists(_.getLong(1) == q), "query never its own neighbor")
    }
  }

  test("two builds agree bit-for-bit (deterministic seeds, quantized means, quantized LUT)") {
    val again = SparkEntry.queries("ann_pq")(spark, d)
    assert(result.exceptAll(again).isEmpty && again.exceptAll(result).isEmpty)
  }

  test("PQ top-10 recalls most of the exact brute-force top-10 at pool 50") {
    graft.functions.DotProduct.register(spark)
    val e = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
      .localCheckpoint()
    val q = e.filter(col("vec_id") >= 20 && col("vec_id") < 25)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("vec_id"))
    val truth = e.crossJoin(broadcast(q))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        expr("graft_dot(qv, v)").as("cosine"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 10)
      .select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val got = result.select(col("query_id"), col("vec_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 0.84 measured at the gate geometry (M=16/K=16, pool 50) on this
    // near-random corpus — PQ's worst case; 0.6 is the guard floor.
    val recall = (truth & got).size.toDouble / truth.size
    assert(recall >= 0.6, s"recall@10 $recall below the PQ pool-50 floor")
  }

  test("stage 1: no shuffle join, reads ONLY the stored PQ codes — never the floats") {
    // The codes are PERSISTED in the IVF vector table (pc column,
    // derived once at build/append/retrain — the sq8 discipline), so
    // the ADC pass scans 8 bytes/vector and joins only broadcast LUTs.
    val (cands, _) = graft.queries.AnnPq.pqCands(spark, d,
      col("vec_id") >= 20 && col("vec_id") < 25)
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"), "PQ stage 1 must not shuffle-join")
    assert(!plan.contains("ShuffledHashJoin"), "PQ stage 1 must not shuffle-join")
    assert(plan.contains("Broadcast"),
      "the per-query LUT must ride a broadcast, never a shuffle")
    assert(plan.contains("pc:bigint"),
      s"stage 1 must read the persisted packed PQ code word:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("composed ann_ivf_pq stage 1: bucket-pruned AND code-only scan") {
    val (cands, _) = graft.queries.AnnPq.pqCands(spark, d,
      col("vec_id") >= 25 && col("vec_id") < 30, prune = true)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"the ADC rank must scan only the probed IVF buckets:\n$plan")
    assert(plan.contains("pc:bigint"),
      s"stage 1 must read the persisted packed PQ code word:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("composed ann_ivf_pq: K ranked rows per query, cosines non-increasing") {
    val rows = SparkEntry.queries("ann_ivf_pq")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(25L, 26L, 27L, 28L, 29L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to 10), s"ranks for $q")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"cosine order for $q")
    }
  }

  test("residual ann_ivf_pqr: K ranked rows per query, reads only the prc words") {
    val rows = SparkEntry.queries("ann_ivf_pqr")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(30L, 31L, 32L, 33L, 34L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to 10), s"ranks for $q")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"cosine order for $q")
      assert(!rs.exists(_.getLong(1) == q), "query never its own neighbor")
    }
    val (cands, _) = graft.queries.AnnPq.pqCands(spark, d,
      col("vec_id") >= 30 && col("vec_id") < 35, prune = true, residual = true)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"the residual ADC rank must scan only the probed IVF buckets:\n$plan")
    assert(plan.contains("prc:bigint"),
      s"stage 1 must read the persisted residual code word:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("packed code word ≡ the array formula (encode kernel vs codeColumn, all books)") {
    import graft.queries.PqCodec
    graft.functions.DotProduct.register(spark)
    val idx = graft.queries.Ann.corpusIdx(spark, d)
    val books = idx.pqBooks.get
    // (books, geometry, stored column, input column) triples — ALL
    // THREE stored words are pinned kernel ≡ formula ≡ store: the
    // residual word's input is the BOUND residual column (the commit
    // that fixed unbound-reference encode), not v (r14 ADVICE #1).
    val residualV = graft.queries.PqCodec.residualCol(col("v"), col("cid"),
      graft.queries.IvfIndex.collectCentroids(idx.centroids))
    val opqV = graft.queries.PqCodec.permuteCol(col("v"), books.opq.get.perm)
    for ((b, geom, stored, input) <- Seq(
        (books.plain, PqCodec.G16, "pc", col("v")),
        (books.wide.get, PqCodec.G8, "pw", col("v")),
        (books.residual.get, PqCodec.G16, "prc", col("rv")),
        (books.opq.get.books, PqCodec.G16, "poc", col("ov")))) {
      val lit = PqCodec.collectBooks(b, geom)
      val rows = idx.assigned
        .withColumn("rv", residualV)
        .withColumn("ov", opqV)
        .select(
          PqCodec.encode(input, lit, geom).as("word"),
          PqCodec.codeColumn(input, lit, geom).as("arr"),
          col(stored))
        .collect()
      assert(rows.nonEmpty)
      val mask = (1L << geom.bits) - 1
      rows.foreach { r =>
        val word = r.getLong(0)
        val arr = r.getSeq[Int](1)
        (0 until geom.m).foreach { m =>
          assert(((word >> (geom.bits * m)) & mask) == arr(m).toLong,
            s"code $m mismatch at $geom: word=$word arr=$arr")
        }
        assert(word == r.getLong(2), s"stored $stored word differs from recompute")
      }
    }
  }

  test("wide-codebook ann_pq_w8: K ranked rows per query off the stored pw words") {
    val rows = SparkEntry.queries("ann_pq_w8")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(35L, 36L, 37L, 38L, 39L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to 10), s"ranks for $q")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"cosine order for $q")
    }
    val (cands, _) = graft.queries.AnnPq.pqCands(spark, d,
      col("vec_id") >= 35 && col("vec_id") < 40, wide = true)
    val plan = cands.queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "wide PQ stage 1 must not shuffle-join")
    assert(plan.contains("pw:bigint"),
      s"stage 1 must read the persisted wide code word:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("pruned wide ann_ivf_pq_w8: bucket-pruned scan of the pw words") {
    val rows = SparkEntry.queries("ann_ivf_pq_w8")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(40L, 41L, 42L, 43L, 44L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to 10), s"ranks for $q")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"cosine order for $q")
      assert(!rs.exists(_.getLong(1) == q), "query never its own neighbor")
    }
    val (cands, _) = graft.queries.AnnPq.pqCands(spark, d,
      col("vec_id") >= 40 && col("vec_id") < 45, prune = true, wide = true)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("SelectedBucketsCount"),
      s"the pruned wide ADC rank must scan only the probed IVF buckets:\n$plan")
    assert(plan.contains("pw:bigint"),
      s"stage 1 must read the persisted wide code word:\n$plan")
    assert(!plan.contains("v:array<double>"),
      s"stage 1 must never read the float vector column:\n$plan")
  }

  test("opq ann_pq_opq: balanced permutation, ranked rows off the stored poc words") {
    val idx = graft.queries.Ann.corpusIdx(spark, d)
    val opq = idx.pqBooks.get.opq.get
    // The permutation is a bijection on 0..63 (an orthogonal rotation).
    assert(opq.perm.sorted == (0 until 64), s"not a permutation: ${opq.perm}")
    // Snake allocation balances energy: each subspace holds exactly one
    // dim from each energy-rank round (ranks r with r/16 = t).
    val rankOf = {
      import org.apache.spark.sql.functions.{floor => ffloor, _}
      val en = idx.assigned
        .select(posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("dim"))
        .agg(sum(ffloor(col("x") * col("x") * graft.queries.PqCodec.EnergyScale + 0.5)).as("en"))
        .collect().map(r => (r.getInt(0), r.getLong(1)))
      en.sortBy { case (dd, e) => (-e, dd) }.map(_._1).zipWithIndex.toMap
    }
    opq.perm.grouped(4).foreach { group =>
      assert(group.map(rankOf(_) / 16).sorted == Seq(0, 1, 2, 3),
        s"subspace $group must hold one dim per energy round")
    }

    val rows = SparkEntry.queries("ann_pq_opq")(spark, d).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(45L, 46L, 47L, 48L, 49L))
    byQ.foreach { case (q, rs) =>
      assert(rs.map(_.getInt(3)).toSeq.sorted == (1 to 10), s"ranks for $q")
      val cos = rs.sortBy(_.getInt(3)).map(_.getDouble(2)).toSeq
      assert(cos == cos.sorted.reverse, s"cosine order for $q")
      assert(!rs.exists(_.getLong(1) == q), "query never its own neighbor")
    }
    val (cands, _) = graft.queries.AnnPq.pqCands(spark, d,
      col("vec_id") >= 45 && col("vec_id") < 50, opq = true)
    val plan = cands.queryExecution.executedPlan.toString
    assert(plan.contains("poc:bigint"),
      s"stage 1 must read the persisted opq code word:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      "opq stage 1 must not shuffle-join")
  }
}
