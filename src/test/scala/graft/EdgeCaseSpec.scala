package graft

import org.apache.spark.sql.functions._

/** Degenerate inputs: empty graphs, isolated vertices, self-loops,
 * unreachable landmarks — where iterative operators typically break. */
class EdgeCaseSpec extends TestBase {
  import spark.implicits._

  private def emptyGraph = GraphFrame(
    Seq(1L, 2L, 3L).toDF("id"), Seq.empty[(Long, Long)].toDF("src", "dst"))

  test("connected components: no edges means every vertex is its own component") {
    val cc = emptyGraph.connectedComponents.run()
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(cc == Map(1L -> 1L, 2L -> 2L, 3L -> 3L))
    val rc = emptyGraph.connectedComponents.setAlgorithm("randomized_contraction")
      .run().select("id", "component").as[(Long, Long)].collect().toMap
    assert(rc == cc)
  }

  test("pageRank on edgeless graph gives every vertex resetProb") {
    val pr = emptyGraph.pageRank.maxIter(3).run()
    val ranks = pr.vertices.select("pagerank").as[Double].collect()
    assert(ranks.forall(r => math.abs(r - 0.15) < 1e-12))
  }

  test("shortestPaths with unreachable/no landmark terminates with empty maps") {
    val sp = chain(3).shortestPaths.landmarks(Seq(99L)).run()
    assert(sp.filter(size($"distances") > 0).count() == 0)
  }

  test("triangleCount ignores self-loops and duplicate edges") {
    val v = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 1L), (1L, 2L))
      .toDF("src", "dst")
    val tc = GraphFrame(v, e).triangleCount.run()
      .select("id", "count").as[(Long, Long)].collect().toMap
    assert(tc == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("kCore/degrees/cycles handle the empty edge set") {
    val kc = emptyGraph.kCore.run().select("kcore").as[Int].collect()
    assert(kc.forall(_ == 0))
    assert(emptyGraph.degrees.count() == 0)
    assert(emptyGraph.detectingCycles.run().count() == 0)
  }

  test("bfs with no path returns empty result") {
    val paths = chain(3).bfs.fromExpr($"id" === 2L).toExpr($"id" === 0L)
      .maxPathLength(5).run()
    assert(paths.count() == 0)
  }

  test("aggregateMessages on empty edges returns no rows") {
    import graft.lib.AggregateMessages
    val am = emptyGraph.aggregateMessages
      .sendToDst(AggregateMessages.src("id"))
      .agg(sum(AggregateMessages.msg).as("s"))
    assert(am.count() == 0)
  }

  test("mis of edgeless graph is all vertices") {
    val mis = emptyGraph.maximalIndependentSet.run()
    assert(mis.select("id").as[Long].collect().toSet == Set(1L, 2L, 3L))
  }
}
