package graft

import org.apache.spark.sql.functions._

/** SimRank (Jeh–Widom): hand-computed fixtures, tail vs distributed
 * parity, sparsity/pruning semantics and the pair-budget guard. */
class SimRankSpec extends TestBase {
  import spark.implicits._

  private def pairs(df: org.apache.spark.sql.DataFrame): Map[(String, String), Double] =
    df.collect().map(r => (r.get(0).toString, r.get(1).toString) ->
      r.getAs[Double]("simrank")).toMap

  test("co-cited pair: two parents, two children — s(c1,c2) = 2c/4 at every round") {
    val v = Seq("p1", "p2", "c1", "c2").toDF("id")
    val e = Seq(("p1", "c1"), ("p1", "c2"), ("p2", "c1"), ("p2", "c2"))
      .toDF("src", "dst")
    for (iters <- Seq(1, 3)) {
      val out = pairs(GraphFrame(v, e).simRank.setC(0.8).maxIter(iters).run())
      // I(c1) = I(c2) = {p1,p2}; only diagonal source pairs contribute:
      // 0.8/4 · 2 = 0.4, and it is a fixed point (s(p1,p2) stays 0)
      assert(out.keySet == Set(("c1", "c2")))
      assert(math.abs(out(("c1", "c2")) - 0.4) < 1e-12)
    }
  }

  test("similarity propagates: shared grandparent makes parents similar, then children more similar") {
    val v = Seq("g", "p1", "p2", "c1", "c2").toDF("id")
    val e = Seq(("g", "p1"), ("g", "p2"), ("p1", "c1"), ("p1", "c2"),
      ("p2", "c1"), ("p2", "c2")).toDF("src", "dst")
    val r2 = pairs(GraphFrame(v, e).simRank.setC(0.8).maxIter(2).run())
    // round 1: s(p1,p2) = 0.8 (same single in-neighbor), s(c1,c2) = 0.4
    // round 2: s(c1,c2) = 0.8/4 · (2·1 + 2·s1(p1,p2)) = 0.2·(2 + 1.6) = 0.72
    assert(math.abs(r2(("p1", "p2")) - 0.8) < 1e-12)
    assert(math.abs(r2(("c1", "c2")) - 0.72) < 1e-12)
  }

  test("directed cycle has no similar pairs (in-neighbor sets never meet)") {
    val v = Seq("a", "b", "c").toDF("id")
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a")).toDF("src", "dst")
    assert(GraphFrame(v, e).simRank.maxIter(4).run().count() == 0)
  }

  test("driver tail and forced-distributed path agree pairwise") {
    // irregular digraph with string ids (exercises sparkOrdering strings)
    val v = ('a' to 'j').map(_.toString).toDF("id")
    val e = Seq("ab", "ac", "db", "dc", "be", "ce", "bf", "gf", "ge", "ha",
      "hd", "ij", "ej", "fj")
      .map(s => (s(0).toString, s(1).toString)).toDF("src", "dst")
    val g = GraphFrame(v, e)
    val tail = pairs(g.simRank.setC(0.8).maxIter(3).run())
    val dist = pairs(g.simRank.setC(0.8).maxIter(3).setSmallGraphThreshold(0).run())
    assert(tail.keySet == dist.keySet, s"pair sets differ: $tail vs $dist")
    tail.foreach { case (k, s) =>
      assert(math.abs(s - dist(k)) < 1e-9, s"pair $k: tail $s vs dist ${dist(k)}") }
    assert(tail.nonEmpty)
  }

  test("minSim prunes between rounds; maxPairs guard fails loudly; setC validates") {
    val v = Seq("g", "p1", "p2", "c1", "c2").toDF("id")
    val e = Seq(("g", "p1"), ("g", "p2"), ("p1", "c1"), ("p1", "c2"),
      ("p2", "c1"), ("p2", "c2")).toDF("src", "dst")
    val g0 = GraphFrame(v, e)
    // minSim 0.5 drops s1(c1,c2)=0.4 between rounds; round 2 rebuilds the
    // c-pair from the diagonal + the surviving (p1,p2)=0.8 — so the value
    // matches the unpruned 0.72 here (the pruned pair fed nothing at
    // round 2), while both finals clear the 0.5 output cut
    val pruned = pairs(g0.simRank.setC(0.8).maxIter(2).setMinSim(0.5).run())
    assert(pruned.keySet == Set(("p1", "p2"), ("c1", "c2")))
    assert(math.abs(pruned(("c1", "c2")) - 0.72) < 1e-12)
    intercept[IllegalArgumentException] {
      g0.simRank.maxIter(2).setSmallGraphThreshold(0).setMaxPairs(1).run().count()
    }
    intercept[IllegalArgumentException] { g0.simRank.setC(1.5) }
    intercept[IllegalArgumentException] { g0.simRank.maxIter(0) }
  }
}
