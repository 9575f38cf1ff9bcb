package graft

import org.apache.spark.sql.functions._

class ClusteringCoefficientSpec extends TestBase {
  import spark.implicits._

  private def cc(g: GraphFrame): Map[Long, (Long, Double)] =
    g.clusteringCoefficient.run()
      .select("id", "tri_count", "clustering_coeff")
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, (r._2, r._3))).toMap

  test("K4 minus one edge: hand-checked coefficients") {
    // edges: full K4 on 0..3 without (0,1) — triangles: (0,2,3), (1,2,3)
    val v = (0L to 3L).toDF("id")
    val e = Seq((0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L))
      .toDF("src", "dst")
    val m = cc(GraphFrame(v, e))
    assert(m(0L) == ((1L, 1.0))) // deg 2, 1 triangle: cc = 1
    assert(m(1L) == ((1L, 1.0)))
    assert(m(2L) == ((2L, 2.0 / 3))) // deg 3, 2 of 3 possible wedges closed
    assert(m(3L) == ((2L, 2.0 / 3)))
  }

  test("triangle-free graphs and low-degree vertices score 0, not NaN") {
    val m = cc(chain(4))
    assert(m.values.forall(_ == ((0L, 0.0))))
    val s = cc(star(3))
    assert(s(0L) == ((0L, 0.0))) // deg 3, no closed wedge
    assert(s(1L) == ((0L, 0.0))) // deg 1 < 2
  }

  test("direction and parallel edges are irrelevant") {
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (2L, 0L))
      .toDF("src", "dst")
    val m = cc(GraphFrame(v, e))
    assert(m.values.forall(_ == ((1L, 1.0))))
  }
}
