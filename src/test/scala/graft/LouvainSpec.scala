package graft

import org.apache.spark.sql.functions._

class LouvainSpec extends TestBase {
  import spark.implicits._

  /** Two triangles {0,1,2} and {3,4,5} bridged by 2 -> 3. */
  private def bridgedTriangles: GraphFrame = {
    val v = (0L to 5L).toDF("id")
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L),
      (3L, 4L), (3L, 5L), (4L, 5L)).toDF("src", "dst")
    GraphFrame(v, e)
  }

  private def communities(g: GraphFrame, threshold: Long): Map[Long, Long] =
    g.louvain.setSmallGraphThreshold(threshold).run()
      .select(col("id").cast("long"), col("community").cast("long"))
      .as[(Long, Long)].collect().toMap

  test("bridged triangles resolve to one community per triangle") {
    for (threshold <- Seq(0L, 100000L)) {
      val c = communities(bridgedTriangles, threshold)
      assert(c.keySet == (0L to 5L).toSet)
      assert(Set(c(0L), c(1L), c(2L)).size == 1)
      assert(Set(c(3L), c(4L), c(5L)).size == 1)
      assert(c(0L) != c(3L))
    }
  }

  test("two bridged 4-blobs resolve to the blobs") {
    for (threshold <- Seq(0L, 100000L)) {
      val c = communities(twoBlobs(4), threshold)
      assert((0L to 3L).map(c).toSet.size == 1)
      assert((4L to 7L).map(c).toSet.size == 1)
      assert(c(0L) != c(7L))
    }
  }

  test("distributed and driver-tail trajectories are identical (string ids too)") {
    // irregular graph: 14-cycle + chords, under/over the tail threshold
    val v = (0L until 14L).toDF("id")
    val e = ((0L until 14L).map(i => (i, (i + 1) % 14)) ++
      Seq((0L, 7L), (3L, 10L), (1L, 5L), (8L, 12L), (2L, 9L)))
      .toDF("src", "dst")
    val g = GraphFrame(v, e)
    for (iters <- Seq(1, 2, 4)) {
      val dist = g.louvain.maxIter(iters).setSmallGraphThreshold(0).run()
        .select("id", "community").as[(Long, Long)].collect().toSet
      val tail = g.louvain.maxIter(iters).setSmallGraphThreshold(100000).run()
        .select("id", "community").as[(Long, Long)].collect().toSet
      assert(dist == tail, s"divergence at maxIter=$iters")
    }
    // string ids: the friends fixture (reciprocal b<->c collapses, g isolated)
    val d2 = friends.louvain.setSmallGraphThreshold(0).run()
      .select("id", "community").as[(String, String)].collect().toSet
    val t2 = friends.louvain.setSmallGraphThreshold(100000).run()
      .select("id", "community").as[(String, String)].collect().toSet
    assert(d2 == t2)
    assert(d2.map(_._1) == Set("a", "b", "c", "d", "e", "f", "g"))
    assert(d2.contains(("g", "g"))) // isolated vertex keeps its own community
  }

  test("result is invariant under input partitioning") {
    val g0 = bridgedTriangles
    val g1 = GraphFrame(g0.vertices.repartition(7), g0.edges.repartition(5))
    assert(communities(g0, 0) == communities(g1, 0))
  }

  test("modularity matches the hand-computed Q on the triangle partition") {
    // m = 7; intra = 6; tot = 7 per triangle side =>
    // Q = (4*7*6 - (49 + 49)) / (4*49) = 70/196
    val g = bridgedTriangles
    val part = Seq((0L, 0L), (1L, 0L), (2L, 0L), (3L, 1L), (4L, 1L), (5L, 1L))
      .toDF("id", "community")
    val r = g.modularity(part).head()
    assert(math.abs(r.getAs[Double]("modularity") - 70.0 / 196.0) < 1e-12)
    assert(r.getAs[Long]("n_communities") == 2L)
    assert(r.getAs[Long]("m_edges") == 7L)
    // the all-singletons partition scores strictly worse
    val single = g.vertices.select(col("id"), col("id").as("community"))
    assert(g.modularity(single).head().getAs[Double]("modularity") < 70.0 / 196.0)
  }

  test("louvain's partition scores at least the singleton partition's Q") {
    val g = twoBlobs(5)
    val found = g.louvain.run().select("id", "community")
    val qFound = g.modularity(found).head().getAs[Double]("modularity")
    val qSingle = g.modularity(
      g.vertices.select(col("id"), col("id").as("community")))
      .head().getAs[Double]("modularity")
    assert(qFound > qSingle)
    assert(qFound > 0.3) // two dense blobs: near the two-community optimum
  }

  test("edgeless and self-loop-only graphs: every vertex its own community") {
    val v = (0L to 3L).toDF("id")
    val e = Seq((1L, 1L)).toDF("src", "dst") // canonicalization drops loops
    val c = GraphFrame(v, e).louvain.run()
      .select("id", "community").as[(Long, Long)].collect().toMap
    assert(c == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L))
  }
}
