package graft

import org.apache.spark.sql.functions._

class GraphStatsSpec extends TestBase {
  import spark.implicits._

  test("stats on the friends graph, hand-checked") {
    val r = friends.stats.head()
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_vertices") == 7L && m("n_edges") == 8L)
    assert(m("n_distinct_edges") == 8L && m("n_self_loops") == 0L)
    assert(m("max_out_degree") == 2L && m("max_in_degree") == 2L)
    assert(m("n_isolated") == 1L) // g
    assert(math.abs(m("avg_out_degree").asInstanceOf[Double] - 8.0 / 7) < 1e-5)
  }

  test("stats counts self-loops and parallel edges faithfully") {
    val v = Seq(0L, 1L).toDF("id")
    val e = Seq((0L, 0L), (0L, 1L), (0L, 1L)).toDF("src", "dst")
    val r = GraphFrame(v, e).stats.head()
    val m = r.getValuesMap[Any](r.schema.fieldNames)
    assert(m("n_edges") == 3L && m("n_distinct_edges") == 2L)
    assert(m("n_self_loops") == 1L && m("max_out_degree") == 3L)
    assert(m("n_isolated") == 0L)
  }

  test("sampleVertices: deterministic, boundary fractions, induced edges only") {
    val g = friends
    val a = g.sampleVertices(0.5, 9L)
    val b = g.sampleVertices(0.5, 9L)
    assert(rows(a.vertices) == rows(b.vertices) && rows(a.edges) == rows(b.edges))
    assert(g.sampleVertices(1.0).vertices.count() == 7)
    assert(g.sampleVertices(0.0).vertices.isEmpty)
    val kept = a.vertices.select("id").as[String].collect().toSet
    for (r <- a.edges.select("src", "dst").as[(String, String)].collect())
      assert(kept(r._1) && kept(r._2), s"dangling edge $r")
  }

  test("sampleEdges keeps the vertex table and a deterministic edge subset") {
    val a = friends.sampleEdges(0.5, 3L)
    assert(a.vertices.count() == 7)
    assert(a.edges.count() <= 8)
    assert(rows(a.edges) == rows(friends.sampleEdges(0.5, 3L).edges))
    intercept[IllegalArgumentException](friends.sampleEdges(1.5))
  }

  test("assortativity: star is exactly -1, regular cycle is null, empty is null") {
    // every star edge pairs degree n with degree 1 — closed form r = -1
    val r = star(6).assortativity.head()
    assert(r.getAs[Long]("m_edges") == 6L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-12)
    // 5-cycle: 2-regular, zero variance => undefined (null), not NaN
    val v = (0L to 4L).toDF("id")
    val e = (0L to 4L).map(i => (i, (i + 1) % 5)).toDF("src", "dst")
    val cyc = GraphFrame(v, e).assortativity.head()
    assert(cyc.isNullAt(cyc.fieldIndex("assortativity")))
    assert(cyc.getAs[Long]("m_edges") == 5L)
    val none = GraphFrame(v, spark.emptyDataset[(Long, Long)].toDF("src", "dst"))
      .assortativity.head()
    assert(none.isNullAt(none.fieldIndex("assortativity")) && none.getLong(1) == 0L)
  }

  test("assortativity ignores direction, multi-edges, and self-loops") {
    val v = (0L to 3L).toDF("id")
    // star 0->{1,2,3} with a reciprocal, a duplicate, and a loop mixed in
    val e = Seq((0L, 1L), (1L, 0L), (0L, 2L), (0L, 2L), (0L, 3L), (2L, 2L))
      .toDF("src", "dst")
    val r = GraphFrame(v, e).assortativity.head()
    assert(r.getAs[Long]("m_edges") == 3L)
    assert(math.abs(r.getAs[Double]("assortativity") - (-1.0)) < 1e-12)
  }
}
