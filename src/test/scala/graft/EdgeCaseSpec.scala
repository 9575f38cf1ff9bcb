package graft

import org.apache.spark.sql.functions._

/** Degenerate inputs: empty graphs, isolated vertices, self-loops,
 * special characters in column names (reference GraphFrameSuite
 * dots/backquote cases),
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

  test("dots in attribute column names survive triplets, find, and filters") {
    // reference GraphFrameSuite.scala:109-142,569-596: a column literally
    // named "a.b" must not be parsed as struct-field access
    val v = Seq((0L, "x"), (1L, "y")).toDF("id", "a.column")
    val e = Seq((0L, 1L, 7.0)).toDF("src", "dst", "a.b")
    val g = GraphFrame(v, e)
    val t = g.triplets.collect()
    assert(t.length == 1)
    assert(t.head.getStruct(1).getAs[Double]("a.b") == 7.0)
    assert(t.head.getStruct(0).getAs[String]("a.column") == "x")
    val m = g.find("(a)-[e]->(b)")
      .select(col("e.`a.b`"), col("a.`a.column`")).collect()
    assert(m.head.getDouble(0) == 7.0 && m.head.getString(1) == "x")
    // filterVertices re-selects edge columns — must keep the dotted name
    val f = g.filterVertices(col("id") >= 0L)
    assert(f.edges.columns.toSeq == Seq("src", "dst", "a.b"))
    assert(f.edges.count() == 1)
    // reversed/undirected re-select attrs by name too
    assert(g.asReversed().edges.columns.toSeq == Seq("src", "dst", "a.b"))
    assert(g.asUndirected().edges.count() == 2)
  }

  test("weighted shortestPaths rejects null weights as loudly as negative ones") {
    // `null < 0` filters to nothing, so without the explicit isNull check a
    // null weight silently became a zero-cost crossing inside the min-merge
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L, Some(1.0)), (1L, 2L, None))
      .toDF("src", "dst", "w")
    val ex = intercept[IllegalArgumentException] {
      GraphFrame(v, e).shortestPaths.landmarks(Seq(0L)).weightCol("w").run()
    }
    assert(ex.getMessage.contains("null or negative"))
  }

  test("segmentDedupStream rejects non-integral id columns at plan time") {
    val docs = Seq(("docA", "hello\nworld")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      streaming.EventStreams.segmentDedupStream(docs, "doc_id", "text")
    }
    assert(ex.getMessage.contains("must be integral"))
  }

  test("hits overflow guard: huge maxIter on a high-degree star stays finite") {
    // star(5000) grows raw sums ~5000x per round; 120 rounds would pass
    // 1e308 without the in-loop rescale (local tail path — the guard
    // logic is shared in shape with the distributed one)
    val m = star(5000).hits.maxIter(120).run()
      .select("id", "hub", "authority").collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    assert(m.values.forall { case (h, a) =>
      java.lang.Double.isFinite(h) && java.lang.Double.isFinite(a) })
    assert(math.abs(m(0L)._1 - 1.0) < 1e-9)   // sole hub, unit normalized
    assert(m(0L)._2 === 0.0)
    val leafAuth = 1.0 / math.sqrt(5000)
    assert(math.abs(m(1L)._2 - leafAuth) < 1e-9)
  }

  test("pregel-backed algorithms pass dotted vertex attribute columns through") {
    // reference ShortestPathsSuite.scala:166-179: Pregel's per-round state
    // re-selects vertex columns by name — a dotted attr must survive
    val v = Seq((0L, "x"), (1L, "y"), (2L, "z")).toDF("id", "attr.dot")
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val sp = GraphFrame(v, e).shortestPaths.landmarks(Seq(2L)).run()
    assert(sp.columns.contains("attr.dot"))
    val d = sp.select(col("id"), element_at(col("distances"), 2L))
      .as[(Long, Option[Int])].collect().toMap
    assert(d == Map(0L -> Some(2), 1L -> Some(1), 2L -> Some(0)))
    assert(sp.select(col("`attr.dot`")).as[String].collect().toSet == Set("x", "y", "z"))
  }

  test("triangleCount keeps dotted and backquoted vertex attribute columns") {
    // reference TriangleCountSuite.scala:104-139
    for (attr <- Seq("a.column", "a`column")) {
      val v = Seq((0L, "a"), (1L, "b"), (2L, "c")).toDF("id", attr)
      val e = Seq((0L, 1L), (1L, 2L), (2L, 0L)).toDF("src", "dst")
      val tc = GraphFrame(v, e).triangleCount.run()
      assert(tc.columns.contains(attr))
      val q = "`" + attr.replace("`", "``") + "`"
      val rows = tc.select(col("id"), col("count"), col(q)).collect()
      assert(rows.length == 3 && rows.forall(_.getLong(1) == 1L))
    }
  }

  test("backquotes in attribute column names survive triplets") {
    val v = Seq((0L, 1), (1L, 2)).toDF("id", "a `col`")
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val g = GraphFrame(v, e)
    val t = g.triplets.collect()
    assert(t.head.getStruct(0).getAs[Int]("a `col`") == 1)
  }

  test("type degrees with dotted edge-type VALUES (pivot column names)") {
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L, "a.b"), (1L, 2L, "plain")).toDF("src", "dst", "rel")
    val out = GraphFrame(v, e).typeOutDegree("rel")
    val m = out.select(col("id"), col("outDegrees.`a.b`")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(m == Map(0L -> 1, 1L -> 0))
  }
}
