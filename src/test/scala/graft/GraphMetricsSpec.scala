package graft

import org.apache.spark.sql.functions._

/** One-row reciprocity and global-transitivity metrics on hand-counted
 * graphs (the modularity/assortativity family). */
class GraphMetricsSpec extends TestBase {
  import spark.implicits._

  test("reciprocity: mutual pair + one-way edge = 2/3; duplicates and loops drop") {
    val v = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (1L, 3L), (2L, 2L))
      .toDF("src", "dst")
    val r = GraphFrame(v, e).reciprocity.head()
    assert(r.getAs[Long]("m_edges") == 3L && r.getAs[Long]("m_mutual") == 2L)
    assert(math.abs(r.getAs[Double]("reciprocity") - 2.0 / 3.0) < 1e-15)
  }

  test("reciprocity: empty graph yields null coefficient, zero counts") {
    val g = GraphFrame(Seq(1L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    val r = g.reciprocity.head()
    assert(r.isNullAt(0) && r.getAs[Long]("m_edges") == 0L)
  }

  test("transitivity: triangle + pendant = 3/5; complete graph = 1") {
    // triangle 1-2-3 plus pendant 3-4: T=1, wedges: d=(2,2,3,1) → 1+1+3 = 5
    val v = (1L to 4L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L)).toDF("src", "dst")
    val t = GraphFrame(v, e).transitivity.head()
    assert(t.getAs[Long]("n_triangles") == 1L && t.getAs[Long]("n_wedges") == 5L)
    assert(math.abs(t.getAs[Double]("transitivity") - 3.0 / 5.0) < 1e-15)
    // K4: T=4, wedges 4·C(3,2)=12 → 12/12 = 1
    val k4 = (for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b))
      .toDF("src", "dst")
    val t4 = GraphFrame(v, k4).transitivity.head()
    assert(t4.getAs[Double]("transitivity") == 1.0)
    assert(t4.getAs[Long]("n_triangles") == 4L && t4.getAs[Long]("n_wedges") == 12L)
  }

  test("transitivity: wedge-free graph (single edge) yields null") {
    val g = GraphFrame(Seq(1L, 2L).toDF("id"), Seq((1L, 2L)).toDF("src", "dst"))
    val t = g.transitivity.head()
    assert(t.isNullAt(0) && t.getAs[Long]("n_wedges") == 0L)
  }

  test("richClub: K4 core with pendants — hand-counted φ(k) sweep") {
    // K4 on 1-4 plus pendants 5-1, 6-2: degrees (4,4,3,3,1,1), 8 edges
    val v = (1L to 6L).toDF("id")
    val e = ((for (a <- 1L to 4L; b <- 1L to 4L if a < b) yield (a, b)) ++
      Seq((5L, 1L), (6L, 2L))).toDF("src", "dst")
    val rows = GraphFrame(v, e).richClub(Seq(0, 2, 3, 4))
      .collect().map(r => r.getAs[Int]("k") ->
        (r.getAs[Long]("n_k"), r.getAs[Long]("e_k"),
          Option(r.getAs[java.lang.Double]("phi")).map(_.doubleValue)))
      .toMap
    assert(rows(0) == ((6L, 8L, Some(16.0 / 30.0))))
    assert(rows(2) == ((4L, 6L, Some(1.0))))
    assert(rows(3) == ((2L, 1L, Some(1.0))))
    assert(rows(4) == ((0L, 0L, None)))
  }

  test("richClub: duplicates, antiparallel edges and self-loops collapse before degrees") {
    val v = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 3L))
      .toDF("src", "dst")
    // canonical edges: {1-2, 2-3}; degrees (1, 2, 1)
    val rows = GraphFrame(v, e).richClub(Seq(0, 1)).collect()
      .map(r => r.getAs[Int]("k") -> (r.getAs[Long]("n_k"), r.getAs[Long]("e_k")))
      .toMap
    assert(rows(0) == ((3L, 2L)) && rows(1) == ((1L, 0L)))
  }

  test("antiparallel edges are ONE undirected edge for transitivity, mutual for reciprocity") {
    val v = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L)).toDF("src", "dst")
    val t = GraphFrame(v, e).transitivity.head()
    assert(t.getAs[Long]("n_triangles") == 1L && t.getAs[Long]("n_wedges") == 3L)
    val r = GraphFrame(v, e).reciprocity.head()
    assert(r.getAs[Long]("m_mutual") == 2L && r.getAs[Long]("m_edges") == 4L)
  }

  test("attributeAssortativity: perfect homophily = 1, bipartite mixing < 0, null-attr edges drop") {
    // two same-category cliques, no cross edges: r = 1 exactly
    val v1 = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "y")).toDF("id", "cat")
    val e1 = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val r1 = GraphFrame(v1, e1).attributeAssortativity("cat").head()
    assert(r1.getAs[Double]("assortativity") == 1.0)
    assert(r1.getAs[Long]("m_edges") == 2L && r1.getAs[Long]("n_categories") == 2L)
    // perfectly DISassortative: every edge crosses categories
    // D = [[0,2],[2,0]], 2m=4, diag=0, S=(2,2): r = (0-8)/(16-8) = -1
    val e2 = Seq((1L, 3L), (2L, 4L)).toDF("src", "dst")
    val r2 = GraphFrame(v1, e2).attributeAssortativity("cat").head()
    assert(r2.getAs[Double]("assortativity") == -1.0)
    // a null attribute drops its edges; remaining single same-cat edge: r undefined
    // (one category only -> den = 0 -> null)
    val v3 = Seq((1L, "x"), (2L, "x"), (3L, null)).toDF("id", "cat")
    val e3 = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val r3 = GraphFrame(v3, e3).attributeAssortativity("cat").head()
    assert(r3.isNullAt(0) && r3.getAs[Long]("m_edges") == 1L)
  }
}
