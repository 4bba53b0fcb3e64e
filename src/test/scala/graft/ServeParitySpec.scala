package graft

import org.apache.spark.sql.functions.col

import graft.graph.Bfs
import graft.search.HybridSearch

/** Serving-tier ⇄ distributed-tier parity: the snapshot BFS and BM25
  * must produce exactly what the Spark formulations produce — the two
  * paths serve different scales but one semantics. */
class ServeParitySpec extends SparkSuite {

  private lazy val cat = SparkSuite.catalog
  private lazy val hs = new HybridSearch(cat)

  test("snapshot BFS ≡ distributed Bfs.traverse for every seed/depth/direction") {
    import spark.implicits._
    val seeds = Seq(
      Seq("model.shoply.fct_orders"),
      Seq("model.shoply.stg_orders"),
      Seq("source.shoply.raw.orders"),
      Seq("model.shoply.stg_orders", "model.shoply.stg_payments")) // multi-seed merge
    for {
      seed <- seeds
      depth <- 0 to 4
      up <- Seq(true, false)
    } {
      val distributed = Bfs.traverse(cat.edges, seed.toDF("id"), depth, up)
        .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
      val served = cat.snapshot.bfs(seed, depth, up).toMap
      assert(served == distributed,
        s"seed=$seed depth=$depth up=$up: served=$served distributed=$distributed")
    }
  }

  test("snapshot BM25 ≡ distributed bm25 on doc set and scores") {
    for (terms <- Seq(Seq("order"), Seq("order", "payment"),
        HybridSearch.tokenizeQuery("customer revenue orders"))) {
      val distributed = hs.bm25(terms).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
      val served = hs.bm25Scores(terms).toMap
      assert(served.keySet == distributed.keySet,
        s"terms=$terms: doc sets differ")
      served.foreach { case (uid, s) =>
        assert(math.abs(s - distributed(uid)) < 1e-9,
          s"terms=$terms uid=$uid served=$s distributed=${distributed(uid)}")
      }
    }
  }

  test("snapshot degree/centrality fields match the distributed ingest values") {
    val fromDf = cat.models
      .select(col("unique_id"), col("upstream_count"), col("downstream_count"), col("centrality"))
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    cat.snapshot.models.foreach { m =>
      assert(fromDf(m.uniqueId) == ((m.upstreamCount, m.downstreamCount, m.centrality)))
    }
  }
}
