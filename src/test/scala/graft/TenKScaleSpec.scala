package graft

import org.apache.spark.sql.functions.col

import graft.graph.Bfs
import graft.search.HybridSearch

/** Distributed-path check at the TOP of the reference's scale envelope
  * (200–10,000+ models, `/root/reference/README.md:13`): one BFS and
  * one BM25 query over a 10,000-model catalog run through the SPARK
  * formulations ([[graft.graph.Bfs.traverse]], [[HybridSearch.bm25]]
  * over [[HybridSearch.buildPostings]]) — not the serving
  * [[graft.serve.Snapshot]] — and agree with the snapshot answers.
  *
  * The serving tier collects the catalog by design (Snapshot.scala
  * scale rationale); this spec is the evidence that the DISTRIBUTED
  * formulations remain a working fallback above the bounded envelope,
  * at the envelope's own upper edge rather than fixture scale
  * (ServeParitySpec covers the semantics exhaustively at fixture
  * scale; this pins them where the catalog is 10k models / ~10k
  * edges / a ~7 MB manifest).
  */
class TenKScaleSpec extends SparkSuite {

  private lazy val cat10k = graft.ingest.ManifestReader.read(spark,
    graft.util.GenManifest.write(10000))

  test("10k-model BFS through the distributed Bfs.traverse path") {
    import spark.implicits._
    // The generated project is one 10k-model chain: downstream of m_0 at
    // the clamp depth 10 is exactly m_1..m_10 at distances 1..10.
    val down = Bfs.traverse(cat10k.edges, Seq("model.gen.m_0").toDF("id"), 10, up = false)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(down == (1 to 10).map(i => s"model.gen.m_$i" -> i).toMap)

    // Upstream from the chain's tail: m_9998..m_9989 plus nothing else.
    val up = Bfs.traverse(cat10k.edges, Seq("model.gen.m_9999").toDF("id"), 10, up = true)
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(up == (1 to 10).map(i => s"model.gen.m_${9999 - i}" -> i).toMap)

    // Snapshot parity at 10k (mid-chain seed, both directions).
    val seed = Seq("model.gen.m_5000")
    for (dirUp <- Seq(true, false)) {
      val distributed = Bfs.traverse(cat10k.edges, seed.toDF("id"), 5, dirUp)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      assert(cat10k.snapshot.bfs(seed, 5, dirUp).toMap == distributed)
    }
  }

  test("10k-model BM25 through the distributed postings path") {
    val hs = new HybridSearch(cat10k)
    val terms = HybridSearch.tokenizeQuery("metric model staging")
    val distributed = hs.bm25(terms).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val served = hs.bm25Scores(terms).toMap
    assert(distributed.nonEmpty)
    assert(served.keySet == distributed.keySet)
    served.foreach { case (uid, s) =>
      assert(math.abs(s - distributed(uid)) < 1e-9, s"uid=$uid served=$s distributed=${distributed(uid)}")
    }
    // Top-10 must agree between the tiers. Scores are equal only to fp
    // sum-order noise (~1e-15), and at 10k models many scores tie
    // exactly, so rank on a rounded score before the uid tiebreak.
    def top(m: Map[String, Double]) =
      m.toSeq.sortBy { case (uid, s) => (-math.rint(s * 1e6), uid) }.take(10).map(_._1)
    assert(top(served) == top(distributed))
  }
}
