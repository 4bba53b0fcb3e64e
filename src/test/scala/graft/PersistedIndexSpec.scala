package graft

import org.apache.spark.sql.functions._

import graft.queries.{DigestIndex, EmbedIndex, IvfIndex, MinhashIndex}
import graft.search.PostingsIndex

/** The shared [[graft.queries.PersistedIndex]] lifecycle contract,
  * asserted UNIFORMLY across all five persisted indexes (the per-class
  * specs pin each index's own semantics — probe equivalence, append ≡
  * rebuild, compaction invariance, stale handles; this spec pins that
  * the round-12 trait hoist left every class on the same contract):
  * branch overlays refuse the base-only operations with the
  * actionable message, and drop() removes every catalog table the
  * handle owns. */
class PersistedIndexSpec extends SparkSuite {

  private val d = "/root/testdata/sf0.001"

  private def docs = Tables.documents(spark, d)
    .filter(col("doc_id") < 200).select(col("doc_id"), col("text"))
  private def vecs = Tables.embeddings(spark, d)
    .filter(col("vec_id") < 200).select(col("vec_id"), col("embedding"))
  private def normVecs = {
    graft.functions.DotProduct.register(spark)
    vecs.select(col("vec_id"), col("embedding").cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(graft.functions.VectorOps.norm2(col("v0"))))
      .select(col("vec_id"), transform(col("v0"), x => x / col("nrm")).as("v"))
  }

  /** One (name, fresh handle, its catalog tables, branch-refusal ops)
    * row per index family. Handles are caller-owned fresh/of clones so
    * drop() here never touches another suite's shared indexes. */
  private def families: Seq[(String, () => (Seq[String], () => Any, () => Any, () => Unit))] = Seq(
    ("digest", () => {
      val i = DigestIndex.fresh(spark, "pidx-dg", docs)
      (Seq(i.tableName), () => i.branch().snapshot(), () => i.branch().compact(), () => i.drop())
    }),
    ("minhash", () => {
      val i = MinhashIndex.fresh(spark, "pidx-mh", docs)
      (Seq(i.tableName, i.arraysTable), () => i.branch().snapshot(), () => i.branch().compact(), () => i.drop())
    }),
    ("embed", () => {
      val i = EmbedIndex.fresh(spark, "pidx-em", vecs)
      (Seq(i.tableName, i.vecsTable), () => i.branch().snapshot(), () => i.branch().compact(), () => i.drop())
    }),
    ("ivf", () => {
      val i = IvfIndex.fresh(spark, "pidx-ivf", normVecs, numCentroids = 4, iters = 1, quantScale = 1e9)
      (Seq(i.tableName), () => i.branch().snapshot(), () => i.branch().compact(), () => i.drop())
    }),
    ("postings", () => {
      // of() is the only constructor PostingsIndex exposes; a snapshot
      // clone is caller-owned, so dropping it leaves the shared of()
      // index intact for other suites.
      val i = PostingsIndex.of(docs, "doc_id", "text", s"pidx-po|$d").snapshot()
      (Seq(i.tableName, i.tableName + "_docs"), () => i.branch().snapshot(), () => i.branch().compact(), () => i.drop())
    }))

  test("branches refuse snapshot()/compact() with the actionable message, all five families") {
    families.foreach { case (name, mk) =>
      val (_, snapOnBranch, compactOnBranch, dropIt) = mk()
      val e1 = intercept[IllegalArgumentException](snapOnBranch())
      assert(e1.getMessage.contains("snapshot() on a branch is unsupported"), name)
      val e2 = intercept[IllegalArgumentException](compactOnBranch())
      assert(e2.getMessage.contains("compact() on a branch is unsupported"), name)
      dropIt()
    }
  }

  test("drop() removes every catalog table the handle owns, all five families") {
    families.foreach { case (name, mk) =>
      val (tables, _, _, dropIt) = mk()
      tables.foreach(t => assert(spark.catalog.tableExists(t), s"$name: $t should exist"))
      dropIt()
      tables.foreach(t => assert(!spark.catalog.tableExists(t), s"$name: $t should be dropped"))
    }
  }
}
