package graft

import org.apache.spark.sql.functions._

class LinkPredictionSpec extends TestBase {
  import spark.implicits._

  private def scores(g: GraphFrame, cap: Long = 0)
      : Map[(Long, Long), (Long, Double, Double, Long)] =
    g.linkPrediction.setMaxHubDegree(cap).run()
      .as[(Long, Long, Long, Double, Double, Long)].collect()
      .map(r => ((r._1, r._2), (r._3, r._4, r._5, r._6))).toMap

  test("path graph: the single distance-2 pair, hand-checked") {
    val m = scores(chain(3)) // undirected path 0-1-2
    assert(m.keySet == Set((0L, 2L)))
    val (cn, jac, aa, pa) = m((0L, 2L))
    assert(cn == 1L && pa == 1L)
    assert(jac == 1.0) // 1 / (1 + 1 - 1)
    assert(math.abs(aa - 1.0 / math.log(2)) < 1e-12)
  }

  test("square: two wedge centers per diagonal; adjacent pairs excluded") {
    val v = (0L to 3L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val m = scores(GraphFrame(v, e))
    assert(m.keySet == Set((0L, 2L), (1L, 3L)))
    val (cn, jac, aa, pa) = m((0L, 2L))
    assert(cn == 2L && pa == 4L && jac == 1.0)
    assert(math.abs(aa - 2.0 / math.log(2)) < 1e-12)
  }

  test("hub cap drops wedge centers above the degree bound") {
    val g = star(3) // 0 -> 1,2,3; undirected center degree 3
    val m = scores(g)
    assert(m.keySet == Set((1L, 2L), (1L, 3L), (2L, 3L)))
    assert(m.values.forall { case (cn, _, aa, _) =>
      cn == 1L && math.abs(aa - 1.0 / math.log(3)) < 1e-12
    })
    assert(scores(g, cap = 2).isEmpty)
  }

  test("direction and parallel edges are irrelevant") {
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L), (1L, 0L), (2L, 1L), (1L, 2L), (1L, 2L))
      .toDF("src", "dst")
    assert(scores(GraphFrame(v, e)) == scores(chain(3)))
  }
}
