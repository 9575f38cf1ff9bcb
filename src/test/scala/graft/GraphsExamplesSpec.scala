package graft

import graft.examples.Graphs

/** Port of reference examples/GraphsSuite.scala:25-60, extended to the
 * other public fixtures (the reference only tests empty + chain). */
class GraphsExamplesSpec extends TestBase {
  import spark.implicits._

  test("empty graph for Int, Long and String ids (reference GraphsSuite:25-31)") {
    for (empty <- Seq(Graphs.empty[Int], Graphs.empty[Long], Graphs.empty[String])) {
      assert(empty.vertices.count() == 0L)
      assert(empty.edges.count() == 0L)
    }
  }

  test("chain graph sizes 0..3 (reference GraphsSuite:32-60)") {
    val chain0 = Graphs.chain(0L)
    assert(chain0.vertices.count() == 0L && chain0.edges.count() == 0L)
    val chain1 = Graphs.chain(1L)
    assert(chain1.vertices.as[Long].collect().toSeq == Seq(0L))
    assert(chain1.edges.count() == 0L)
    val chain2 = Graphs.chain(2L)
    assert(chain2.vertices.as[Long].collect().toSet == Set(0L, 1L))
    assert(chain2.edges.as[(Long, Long)].collect().toSeq == Seq((0L, 1L)))
    val chain3 = Graphs.chain(3L)
    assert(chain3.edges.as[(Long, Long)].collect().toSet == Set((0L, 1L), (1L, 2L)))
    intercept[IllegalArgumentException](Graphs.chain(-1L))
  }

  test("friends, star, twoBlobs and ALS fixtures have the reference shapes") {
    val f = Graphs.friends
    assert(f.vertices.count() == 7 && f.edges.count() == 8)
    assert(f.vertices.columns.toSeq == Seq("id", "name", "age"))
    assert(f.edges.columns.toSeq == Seq("src", "dst", "relationship"))
    val s = Graphs.star(4L)
    assert(s.vertices.count() == 5)
    assert(s.edges.select("src").distinct().as[Long].collect().toSeq == Seq(0L))
    val b = Graphs.twoBlobs(3)
    assert(b.vertices.count() == 6 && b.edges.count() == 2 * 9 + 1)
    assert(b.edges.columns.toSeq == Seq("src", "dst", "e_attr1"))
    val als = Graphs.ALSSyntheticData()
    // bipartite by parity: sources even (users), destinations odd (items)
    assert(als.edges.filter($"src" % 2 =!= 0 || $"dst" % 2 =!= 1).count() == 0)
    val w = als.edges.select("weight").as[Double].collect()
    assert(w.nonEmpty && w.forall(x => x >= 1.0 && x <= 5.0))
  }
}
