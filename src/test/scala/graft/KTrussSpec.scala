package graft

import org.apache.spark.sql.functions._

class KTrussSpec extends TestBase {
  import spark.implicits._

  private def truss(g: GraphFrame, k: Int): Set[(Long, Long, Long)] =
    g.kTruss.setK(k).run().as[(Long, Long, Long)].collect().toSet

  /** K4 on 0..3 plus a pendant triangle (2, 3, 4). */
  private def k4PlusEar: GraphFrame = {
    val v = (0L to 4L).toDF("id")
    val e = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L),
      (2L, 4L), (3L, 4L)).toDF("src", "dst")
    GraphFrame(v, e)
  }

  test("k=4 peels the pendant ear but keeps K4 (cascade correctness)") {
    // ear edges (2,4),(3,4) have support 1 < 2 and drop; edge (2,3) loses
    // the ear triangle but keeps support 2 inside K4 — K4 survives intact
    val t = truss(k4PlusEar, 4)
    assert(t.map(e => (e._1, e._2)) ==
      Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L), (2L, 3L)))
    assert(t.forall(_._3 == 2L)) // every K4 edge closes 2 triangles
  }

  test("k=5 cascades K4 to empty; k=3 keeps every triangle edge") {
    assert(truss(k4PlusEar, 5).isEmpty)
    val t3 = truss(k4PlusEar, 3).map(e => (e._1, e._2))
    assert(t3.size == 8) // all edges sit in >= 1 triangle
  }

  test("k=2 keeps the whole simple graph, including triangle-free edges") {
    val g = chain(4) // no triangles at all
    val t = truss(g, 2)
    assert(t.map(e => (e._1, e._2)) == Set((0L, 1L), (1L, 2L), (2L, 3L)))
    assert(t.forall(_._3 == 0L))
  }

  test("direction and duplicates are irrelevant; self-loops drop") {
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 0L), (1L, 1L))
      .toDF("src", "dst")
    val t = truss(GraphFrame(v, e), 3)
    assert(t == Set((0L, 1L, 1L), (0L, 2L, 1L), (1L, 2L, 1L)))
  }

  test("invalid k rejected") {
    intercept[IllegalArgumentException](k4PlusEar.kTruss.setK(1))
  }
}
