package graft

import org.apache.spark.sql.functions._

class AlgorithmsSpec extends TestBase {
  import spark.implicits._

  // ---- Pregel / AggregateMessages primitives ----

  test("aggregateMessages: sum of neighbor ages") {
    import graft.lib.AggregateMessages
    val am = friends.aggregateMessages
      .sendToSrc(AggregateMessages.dst("age"))
      .sendToDst(AggregateMessages.src("age"))
      .agg(sum(AggregateMessages.msg).as("summedAges"))
    val m = am.as[(String, Long)].collect().toMap
    // a: nbrs b(36)+e(32)+d(29) = 97
    assert(m("a") == 97)
    assert(!m.contains("g"))
  }

  test("pregel: in-degree via constant messages") {
    import graft.lib.Pregel
    val res = chain(4).pregel
      .withVertexColumn("cnt", lit(0L), coalesce(Pregel.msg, lit(0L)))
      .sendMsgToDst(lit(1L))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(1)
      .run()
    val m = res.as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  // ---- Algorithms ----

  test("pageRank on star graph") {
    val g = star(3) // 0 -> 1,2,3
    val pr = g.pageRank.resetProbability(0.15).maxIter(10).run()
    val ranks = pr.vertices.select("id", "pagerank").as[(Long, Double)].collect().toMap
    // leaves get 0.15 + 0.85 * (rank0 / 3); center never receives: 0.15
    assert(math.abs(ranks(0L) - 0.15) < 1e-9)
    val leaf = 0.15 + 0.85 * 0.15 / 3
    assert(math.abs(ranks(1L) - leaf) < 1e-9)
    assert(math.abs(ranks(1L) - ranks(3L)) < 1e-12)
    // edge weights = 1/outDegree
    val w = pr.edges.select("weight").as[Double].collect()
    assert(w.forall(x => math.abs(x - 1.0 / 3) < 1e-12))
  }

  test("pageRank: local tail == distributed supersteps (all four modes)") {
    // friends: string ids, an isolated vertex (g), a cycle — run every
    // mode through BOTH paths and require identical trajectories
    def ranks(build: lib.PageRank => lib.PageRank, threshold: Long): Map[String, Double] =
      build(friends.pageRank).setSmallGraphThreshold(threshold).run()
        .vertices.select("id", "pagerank").as[(String, Double)].collect().toMap
    val modes: Seq[(String, lib.PageRank => lib.PageRank)] = Seq(
      ("fixed", _.resetProbability(0.15).maxIter(7)),
      ("tol", _.resetProbability(0.15).tol(0.001)),
      ("personalized", _.resetProbability(0.15).maxIter(7).sourceId("a")),
      ("personalized-tol", _.resetProbability(0.15).tol(0.001).sourceId("a")))
    for ((name, build) <- modes) {
      val local = ranks(build, 100000)
      val dist = ranks(build, 0)
      assert(local.keySet == dist.keySet, name)
      for ((k, v) <- local)
        assert(math.abs(v - dist(k)) < 1e-9, s"$name vertex $k: $v vs ${dist(k)}")
    }
    // weighted mode on a graph with a weight column
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L, 3.0), (0L, 2L, 1.0), (1L, 2L, 2.0), (2L, 0L, 1.0))
      .toDF("src", "dst", "w")
    def wr(threshold: Long): Map[Long, Double] =
      GraphFrame(v, e).pageRank.resetProbability(0.15).maxIter(8).weightCol("w")
        .setSmallGraphThreshold(threshold).run()
        .vertices.select("id", "pagerank").as[(Long, Double)].collect().toMap
    val wl = wr(100000)
    val wd = wr(0)
    for ((k, x) <- wl) assert(math.abs(x - wd(k)) < 1e-9, s"weighted vertex $k")
    // the tail still reports the edge-weight frame
    val ew = GraphFrame(v, e).pageRank.maxIter(2).setSmallGraphThreshold(100000)
      .run().edges.select("src", "dst", "weight").as[(Long, Long, Double)].collect()
    assert(ew.length == 4 && ew.forall(_._3 > 0))
  }

  test("parallelPersonalizedPageRank: local tail == distributed supersteps") {
    def ranks(threshold: Long): Map[String, Seq[Double]] =
      friends.parallelPersonalizedPageRank.resetProbability(0.15).maxIter(6)
        .sourceIds(Seq("a", "e", "g")) // g is isolated: lane teleports only
        .setSmallGraphThreshold(threshold).run()
        .vertices.select("id", "pageranks").as[(String, Seq[Double])].collect().toMap
    val local = ranks(100000)
    val dist = ranks(0)
    assert(local.keySet == dist.keySet)
    for ((k, v) <- local) {
      assert(v.size == 3 && dist(k).size == 3, k)
      v.zip(dist(k)).foreach { case (a, b) =>
        assert(math.abs(a - b) < 1e-9, s"vertex $k: $v vs ${dist(k)}")
      }
    }
    // isolated source g: own lane keeps the teleport mass, others 0
    assert(math.abs(local("g")(2) - 0.15) < 1e-12 && local("g")(0) == 0.0)
  }

  test("pageRank sums to ~V on a cycle") {
    val v = (0L until 4L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L)).toDF("src", "dst")
    val pr = GraphFrame(v, e).pageRank.maxIter(20).run()
    val s = pr.vertices.agg(sum("pagerank")).as[Double].head()
    assert(math.abs(s - 4.0) < 1e-6)
  }

  test("personalized pageRank: unreachable vertex has rank 0 (reference PageRankSuite)") {
    val r = friends.pageRank.resetProbability(0.15).maxIter(10).sourceId("a").run()
    val gRank = r.vertices.filter(col("id") === "g")
      .select("pagerank").as[Double].head()
    assert(gRank == 0.0, s"g is unreachable from a; got $gRank")
  }

  test("pageRank keeps every vertex on disconnected components (reference PageRankSuite)") {
    val v = (0L until 7L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val r = GraphFrame(v, e).pageRank.resetProbability(0.15).maxIter(10).run()
    assert(r.vertices.count() == 7)
    assert(r.vertices.filter(col("pagerank") <= 0).count() == 0)
  }

  test("pageRank tolerance mode converges to the fixed-iteration answer") {
    val v = (0L until 4L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)).toDF("src", "dst")
    val g = GraphFrame(v, e)
    val fixed = g.pageRank.maxIter(60).run()
      .vertices.select("id", "pagerank").as[(Long, Double)].collect().toMap
    val tol = g.pageRank.tol(1e-8).run()
      .vertices.select("id", "pagerank").as[(Long, Double)].collect().toMap
    (0L until 4L).foreach { i =>
      assert(math.abs(fixed(i) - tol(i)) < 1e-6, s"vertex $i")
    }
  }

  test("shortestPaths hop counts to landmarks") {
    val g = chain(4) // 0->1->2->3
    val sp = g.shortestPaths.landmarks(Seq(3L)).run()
    val d = sp.select($"id", element_at($"distances", 3L)).as[(Long, Option[Int])]
      .collect().toMap
    assert(d == Map(0L -> Some(3), 1L -> Some(2), 2L -> Some(1), 3L -> Some(0)))
  }

  test("shortestPaths undirected + multiple landmarks") {
    val g = chain(4)
    val sp = g.shortestPaths.landmarks(Seq(0L, 3L)).setDirected(false).run()
    val d0 = sp.select($"id", element_at($"distances", 0L)).as[(Long, Option[Int])]
      .collect().toMap
    assert(d0 == Map(0L -> Some(0), 1L -> Some(1), 2L -> Some(2), 3L -> Some(3)))
  }

  test("connectedComponents on twoBlobs + isolated vertex") {
    val g = twoBlobs(3) // cliques {0,1,2} {3,4,5} bridged 0->5
    val cc = g.connectedComponents.run()
    val comps = cc.select("id", "component").as[(Long, Long)].collect().toMap
    assert(comps.values.toSet.size == 1)
    // separate components when no bridge
    val g2 = GraphFrame((0L until 5L).toDF("id"),
      Seq((0L, 1L), (1L, 2L), (3L, 4L)).toDF("src", "dst"))
    val cc2 = g2.connectedComponents.run()
    val m = cc2.select("id", "component").as[(Long, Long)].collect().toMap
    assert(m(0L) == m(1L) && m(1L) == m(2L))
    assert(m(3L) == m(4L))
    assert(m(0L) != m(3L))
  }

  test("reliable checkpointing: CC and Pregel write cuts to the checkpoint dir") {
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    // force the distributed loop so IterationManager cycles actually run
    val cc = twoBlobs(3).connectedComponents
      .setSmallGraphThreshold(0).setUseReliableCheckpoint(dir).run()
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(cc.values.toSet.size == 1)
    val pr = chain(4).pageRank.maxIter(3).setUseReliableCheckpoint(dir).run()
      .vertices.select("id", "pagerank").as[(Long, Double)].collect()
    assert(pr.length == 4 && pr.forall(_._2 > 0))
    // reliable cuts leave rdd checkpoint files behind (local ones don't)
    def countFiles(p: java.io.File): Int =
      if (p.isDirectory) p.listFiles.map(countFiles).sum else 1
    assert(countFiles(new java.io.File(dir)) > 0,
      "no checkpoint files written under the reliable dir")
  }

  test("withReliableDir matches path components, not string prefixes") {
    val sc = spark.sparkContext
    val base = java.nio.file.Files.createTempDirectory("graft-ckpt-pfx").toString
    // existing dir <base>/ab must NOT satisfy a request for <base>/a
    sc.setCheckpointDir(s"$base/ab")
    graft.lib.IterationManager.withReliableDir(spark, Some(s"$base/a"))
    val afterA = sc.getCheckpointDir.get
    assert(afterA.replaceFirst("^file:", "").startsWith(s"$base/a/"),
      s"prefix-collided dir kept: $afterA")
    // re-requesting the same dir keeps Spark's uuid child (no churn),
    // even though getCheckpointDir reports a file: URI
    graft.lib.IterationManager.withReliableDir(spark, Some(s"$base/a"))
    assert(sc.getCheckpointDir.get == afterA, "same-dir request must not re-set")
    // and a file:-scheme request for the same path is also recognized
    graft.lib.IterationManager.withReliableDir(spark, Some(s"file:$base/a"))
    assert(sc.getCheckpointDir.get == afterA, "file: URI spelling must match")
  }

  test("connectedComponents: distributed supersteps and union-find fast path agree") {
    for (g <- Seq(twoBlobs(3), chain(9), star(5), friends)) {
      val fast = g.connectedComponents.run()
        .select(col("id").cast("string"), col("component")).as[(String, Long)]
        .collect().sortBy(_._1).toSeq
      val dist = g.connectedComponents.setSmallGraphThreshold(0).run()
        .select(col("id").cast("string"), col("component")).as[(String, Long)]
        .collect().sortBy(_._1).toSeq
      assert(fast == dist, s"fast path diverged from distributed on $g")
    }
    // mid-loop handoff: distributed rounds first, union-find on the
    // contracted remainder once it drops under the threshold
    val g = twoBlobs(4)
    val mixed = g.connectedComponents.setSmallGraphThreshold(5).run()
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert(mixed.values.toSet.size == 1)
  }

  test("connectedComponents with string ids") {
    val cc = friends.connectedComponents.run()
    val m = cc.select("id", "component").as[(String, Long)].collect().toMap
    // a,b,c,d,e,f all connected; g isolated
    assert(Set("a", "b", "c", "d", "e", "f").map(m).size == 1)
    assert(m("g") != m("a"))
  }

  test("connectedComponents useLabelsAsComponents gives original-typed labels") {
    val cc = friends.connectedComponents.setUseLabelsAsComponents(true).run()
    val m = cc.select("id", "component").as[(String, String)].collect().toMap
    assert(Set("a", "b", "c", "d", "e", "f").map(m) == Set("a"))
    assert(m("g") == "g")
  }

  test("pregel with checkpointing disabled still converges") {
    import graft.lib.Pregel
    val res = chain(4).pregel
      .withVertexColumn("cnt", lit(0L), coalesce(Pregel.msg, lit(0L)))
      .sendMsgToDst(lit(1L))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(3)
      .setCheckpointInterval(0)
      .run()
    val m = res.as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L))
  }

  test("triangleCount on twoBlobs") {
    val g = twoBlobs(3)
    val tc = g.triangleCount.run()
    val m = tc.select("id", "count").as[(Long, Long)].collect().toMap
    // each 3-clique is one triangle per vertex; bridge adds none
    assert(m == Map(0L -> 1L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L))
  }

  test("labelPropagation: local tail == distributed supersteps (directed + undirected)") {
    for (dir <- Seq(true, false)) {
      def labels(threshold: Long): Map[String, String] =
        friends.labelPropagation.setDirected(dir).maxIter(4)
          .setSmallGraphThreshold(threshold).run()
          .select("id", "label").as[(String, String)].collect().toMap
      val local = labels(100000)
      val dist = labels(0)
      assert(local == dist, s"directed=$dir")
      assert(local("g") == "g") // isolated vertex keeps its own label
    }
  }

  test("labelPropagation converges on two cliques (undirected)") {
    val g = twoBlobs(4)
    // remove the bridge for clean communities
    val g2 = g.filterEdges(!($"src" === 0L && $"dst" === 7L))
    val lp = g2.labelPropagation.setDirected(false).maxIter(10).run()
    val m = lp.select("id", "label").as[(Long, Long)].collect().toMap
    assert((0L to 3L).map(m).toSet.size == 1)
    assert((4L to 7L).map(m).toSet.size == 1)
  }

  test("bfs finds shortest path") {
    val paths = friends.bfs
      .fromExpr($"name" === "Esther").toExpr($"age" < 32).run()
    // e->d (age 29) is 1 hop
    assert(paths.columns.toSeq == Seq("from", "e0", "to"))
    val p = paths.select($"from.id", $"to.id").as[(String, String)].collect().toSet
    assert(p == Set(("e", "d")))
  }

  test("bfs zero-length and edge filter") {
    val zero = friends.bfs.fromExpr($"name" === "Esther").toExpr($"age" === 32).run()
    assert(zero.select($"from.id", $"to.id").as[(String, String)].head() == (("e", "e")))
    val filtered = friends.bfs.fromExpr($"name" === "Esther").toExpr($"age" < 32)
      .edgeFilter($"relationship" =!= "friend").run()
    // without friend edges: e->f->c (age 30), 2 hops
    assert(filtered.select($"to.id").as[String].collect().toSet == Set("c"))
  }

  test("aggregateMessages: multiple message and aggregation columns") {
    // reference AggregateMessagesSuite.scala:108-160
    import graft.lib.{AggregateMessages => AM}
    val v = Seq((1, 30), (2, 40), (3, 50), (4, 60)).toDF("id", "att1")
    val e = Seq((1, 2, 4), (2, 3, 5), (1, 4, 6)).toDF("src", "dst", "att2")
    val g = GraphFrame(v, e)
    val agg = g.aggregateMessages
      .sendToDst(AM.src("att1").as("att1"), AM.edge("att2").as("att2"))
      .sendToSrc(AM.dst("att1").as("att1"), AM.edge("att2").as("att2"))
      .agg(sum(AM.msg("att1")).as("sum_att1"), avg(AM.msg("att2")).as("avg_att2"))
    assert(agg.columns.toSeq == Seq("id", "sum_att1", "avg_att2"))
    val m = agg.as[(Int, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m == Map(1 -> ((100L, 5.0)), 2 -> ((80L, 4.5)),
      3 -> ((40L, 5.0)), 4 -> ((30L, 6.0))))
  }

  test("kCore: triangle with tail — degree != kcore (early-convergence trap)") {
    // reference KCoreSuite.scala:294-324: vertices 1 and 4 have degree >
    // kcore, so an implementation converging after one superstep (kcore =
    // degree) fails here while passing clique/chain tests
    val v = Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"), (5L, "e")).toDF("id", "name")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 4L), (4L, 5L)).toDF("src", "dst")
    val m = GraphFrame(v, e).kCore.run()
      .select("id", "kcore").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> 2, 2L -> 2, 3L -> 2, 4L -> 1, 5L -> 1))
  }

  test("SortedArrayIntersect kernels: match array_intersect, interp == codegen") {
    import graft.expressions.SortedArrayIntersect.{sortedIntersect, sortedIntersectSize}
    val rnd = new scala.util.Random(7)
    val rows = (0 until 200).map { _ =>
      def arr = rnd.shuffle((0L until 60L).toList).take(rnd.nextInt(20)).distinct.sorted
      (arr, arr)
    } :+ ((Nil: List[Long], List(1L, 2L))) :+ ((List(5L), Nil: List[Long]))
    val df = rows.toDF("a", "b")
    val got = df.select(
      sortedIntersect($"a", $"b").as("m"),
      sortedIntersectSize($"a", $"b").as("n"),
      array_intersect($"a", $"b").as("ref")).collect()
    got.foreach { r =>
      val ref = r.getSeq[Long](2).sorted
      assert(r.getSeq[Long](0) == ref)
      assert(r.getInt(1) == ref.size)
    }
    // string element type routes through the ordering path — same contract
    val sdf = Seq((Seq("a", "c", "x"), Seq("b", "c", "x", "z"))).toDF("a", "b")
    val srow = sdf.select(sortedIntersect($"a", $"b"), sortedIntersectSize($"a", $"b")).head
    assert(srow.getSeq[String](0) == Seq("c", "x") && srow.getInt(1) == 2)
    // interpreted kernel agrees with the executed (codegen) path
    import org.apache.spark.sql.catalyst.util.ArrayData
    val ia = ArrayData.toArrayData(Array(1L, 3L, 5L, 9L))
    val ib = ArrayData.toArrayData(Array(3L, 4L, 9L))
    assert(graft.expressions.SortedArrayIntersect.sizeLong(ia, ib) == 2)
    assert(graft.expressions.SortedArrayIntersect.intersectLong(ia, ib)
      .toLongArray().toSeq == Seq(3L, 9L))
  }

  test("triangleCount: oriented hub path agrees with the intersect path") {
    // random graphs, both paths forced via the hub-threshold conf
    val rnd = new scala.util.Random(11)
    for (trial <- 0 until 3) {
      val n = 40
      val edges = (0 until 300).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b }
      val g = GraphFrame.fromEdges(edges.toDF("src", "dst"))
      val base = g.triangleCount.run().select("id", "count")
        .as[(Long, Long)].collect().toMap
      spark.conf.set(GraftConf.TriangleHubThresholdKey, "0")
      try {
        val oriented = g.triangleCount.run().select("id", "count")
          .as[(Long, Long)].collect().toMap
        assert(oriented == base, s"trial $trial")
      } finally spark.conf.unset(GraftConf.TriangleHubThresholdKey)
    }
    // hub star + one rim edge: exactly one triangle, found on the skew path
    val star = (1L to 20L).map(h => (0L, h)) :+ (1L, 2L)
    spark.conf.set(GraftConf.TriangleHubThresholdKey, "4")
    try {
      val m = GraphFrame.fromEdges(star.toDF("src", "dst")).triangleCount.run()
        .select("id", "count").as[(Long, Long)].collect().toMap
      assert(m(0L) == 1 && m(1L) == 1 && m(2L) == 1 && m(3L) == 0)
    } finally spark.conf.unset(GraftConf.TriangleHubThresholdKey)
  }

  test("triangleCount: bi-directed and duplicate edges count each triangle once") {
    // reference TriangleCountSuite.scala:69-103 (notes GraphX double-counts
    // bi-directed triangles; the DataFrame semantics must not)
    val tris = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L) ++ Seq(0L -> -1L, -1L -> -2L, -2L -> 0L)
    val bidi = tris ++ tris.map { case (a, b) => (b, a) }
    val g1 = GraphFrame.fromEdges(bidi.toDF("src", "dst"))
    val m1 = g1.triangleCount.run().select("id", "count")
      .as[(Long, Long)].collect().toMap
    assert(m1(0L) == 2 && m1.filter(_._1 != 0L).values.toSet == Set(1L))
    val dup = Seq(0L -> 1L, 1L -> 2L, 2L -> 0L) ++ Seq(0L -> 1L, 1L -> 2L, 2L -> 0L)
    val m2 = GraphFrame.fromEdges(dup.toDF("src", "dst")).triangleCount.run()
      .select("count").as[Long].collect().toSet
    assert(m2 == Set(1L))
  }

  test("bfs corner cases ported from reference BFSSuite") {
    // unmatched from/to expressions return nothing (reference :83-88)
    assert(friends.bfs.fromExpr($"id" === "howdy").toExpr($"id" === "a").run().count() == 0)
    assert(friends.bfs.fromExpr($"id" === "a").toExpr($"id" === "howdy").run().count() == 0)
    // 0 hops when from == to: (from, to) only (reference :90-96)
    val zero = friends.bfs.fromExpr($"id" === "a").toExpr($"id" === "a").run()
    assert(zero.count() == 1 && zero.columns.toSeq == Seq("from", "to"))
    // ties: e -> b has exactly two 3-hop paths, both returned, full
    // column contract (reference :105-114)
    val ties = friends.bfs.fromExpr($"id" === "e").toExpr($"id" === "b").run()
    assert(ties.count() == 2)
    assert(ties.columns.toSeq == Seq("from", "e0", "v1", "e1", "v2", "e2", "to"))
    assert(ties.select($"to.id").as[String].collect().toSeq == Seq("b", "b"))
    // maxPathLength boundaries (reference :116-130)
    assert(friends.bfs.fromExpr($"id" === "e").toExpr($"id" === "f")
      .maxPathLength(1).run().count() == 1)
    assert(friends.bfs.fromExpr($"id" === "e").toExpr($"id" === "f")
      .maxPathLength(0).run().count() == 0)
    assert(friends.bfs.fromExpr($"id" === "e").toExpr($"id" === "b")
      .maxPathLength(3).run().count() == 2)
    assert(friends.bfs.fromExpr($"id" === "e").toExpr($"id" === "b")
      .maxPathLength(2).run().count() == 0)
    // string expression overloads (reference :157-169)
    val s = friends.bfs.fromExpr("id = 'e'").toExpr("age < 32").run()
    assert(s.select($"to.id").as[String].collect().toSet == Set("d"))
  }

  test("kCore: clique has core n-1, chain has core 1") {
    val g = twoBlobs(4) // two 4-cliques → core 3
    val kc = g.kCore.run()
    val m = kc.select("id", "kcore").as[(Long, Int)].collect().toMap
    assert(m.values.toSet == Set(3))
    val ch = chain(5)
    val kc2 = ch.kCore.run()
    assert(kc2.select("kcore").as[Int].collect().toSet == Set(1))
    // isolated vertex gets 0
    val kcf = friends.kCore.run()
    val mf = kcf.select("id", "kcore").as[(String, Int)].collect().toMap
    assert(mf("g") == 0)
  }

  test("detectingCycles finds directed cycles once, at min vertex") {
    val v = (1L to 5L).toDF("id")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L)).toDF("src", "dst")
    val cycles = GraphFrame(v, e).detectingCycles.run()
    val found = cycles.as[Seq[Long]].collect().toSet
    assert(found == Set(Seq(1L, 2L, 3L)))
    // mutual pair = 2-cycle
    val cyc2 = friends.detectingCycles.run().as[Seq[String]].collect().toSet
    assert(cyc2.contains(Seq("b", "c")))
  }

  test("maximalIndependentSet is independent and maximal") {
    val g = twoBlobs(4)
    val mis = g.maximalIndependentSet.run()
    val ids = mis.select("id").as[Long].collect().toSet
    // in a clique exactly one vertex can be chosen
    assert(ids.intersect((0L to 3L).toSet).size == 1)
    assert(ids.intersect((4L to 7L).toSet).size == 1)
    // isolated vertices always join the MIS
    val misF = friends.maximalIndependentSet.run()
    assert(misF.select("id").as[String].collect().toSet.contains("g"))
  }

  test("stronglyConnectedComponents separates cycle from tail") {
    val v = (0L until 5L).toDF("id")
    // cycle 0->1->2->0, tail 2->3->4
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L)).toDF("src", "dst")
    val scc = GraphFrame(v, e).stronglyConnectedComponents.run()
    val m = scc.select("id", "component").as[(Long, Long)].collect().toMap
    assert(m(0L) == m(1L) && m(1L) == m(2L))
    assert(m(3L) != m(0L) && m(4L) != m(0L) && m(3L) != m(4L))
  }

  test("scc: descending-id chain of singleton SCCs (trim pre-pass)") {
    // ids DESCEND downstream — without the trim pre-pass the coloring
    // algorithm peels exactly one vertex per outer round here (measured
    // 8.4x slower at n=30 in round 6); the trim must label every vertex
    // as its own component without burning an outer round per layer
    val n = 12
    val v = (1 to n).map(_.toLong).toDF("id")
    val e = (2 to n).map(i => (i.toLong, (i - 1).toLong)).toDF("src", "dst")
    val m = GraphFrame(v, e).stronglyConnectedComponents.run()
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert((1 to n).forall(i => m(i.toLong) == i.toLong))
    // chain INTO a cycle: trim peels the tail, coloring keeps the cycle
    val e2 = e.unionAll(Seq((1L, n.toLong)).toDF("src", "dst")) // closes 1 -> n
    val m2 = GraphFrame(v, e2).stronglyConnectedComponents.run()
      .select("id", "component").as[(Long, Long)].collect().toMap
    assert((1 to n).map(i => m2(i.toLong)).toSet.size == 1) // now one SCC
  }

  test("kcore: local tail == distributed supersteps (blobs + chain, cap)") {
    val g = twoBlobs(4) // two 4-cliques (coreness 3) bridged by one edge
    def cores(threshold: Long, cap: Int = Int.MaxValue): Map[Long, Int] =
      g.kCore.maxIter(cap).setSmallGraphThreshold(threshold).run()
        .select("id", "kcore").as[(Long, Int)].collect().toMap
    val local = cores(100000)
    val dist = cores(0)
    assert(local == dist, s"$local vs $dist")
    assert(local.values.forall(_ == 3)) // bridge doesn't change coreness
    // mid-convergence cap truncation must match too
    assert(cores(100000, cap = 1) == cores(0, cap = 1))
  }

  test("detectingCycles: local tail == distributed supersteps (overlapping cycles, cap)") {
    // overlapping cycles sharing vertex 0: 0->1->2->0, 0->2 (short 0->2->0? no
    // reverse), plus 1->3->1 and a self-loop 4->4; 5 isolated
    val v = (0L to 5L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (1L, 3L), (3L, 1L), (4L, 4L),
      (2L, 1L)).toDF("src", "dst")
    def cycles(threshold: Long, cap: Int = 50): Set[Seq[Long]] =
      GraphFrame(v, e).detectingCycles.maxIter(cap)
        .setSmallGraphThreshold(threshold).run()
        .select("found_cycles").as[Seq[Long]].collect().toSet
    val local = cycles(100000)
    val dist = cycles(0)
    assert(local == dist, s"$local vs $dist")
    assert(local.contains(Seq(0L, 1L, 2L)) && local.contains(Seq(1L, 2L)) &&
      local.contains(Seq(1L, 3L)) && local.contains(Seq(4L)), local)
    // the length cap must truncate identically (cap 2: 3-cycles drop)
    assert(cycles(100000, cap = 2) == cycles(0, cap = 2))
    assert(!cycles(100000, cap = 2).contains(Seq(0L, 1L, 2L)))
  }

  test("mis: md5 local tail == distributed supersteps; independence + maximality") {
    def mis(threshold: Long): Set[String] =
      friends.maximalIndependentSet.setHashMode("md5")
        .setSmallGraphThreshold(threshold).run()
        .select("id").as[String].collect().toSet
    val local = mis(100000)
    val dist = mis(0)
    assert(local == dist, s"$local vs $dist")
    // independence + maximality against the undirected edge set
    val und = Set(("a", "b"), ("b", "c"), ("c", "b"), ("f", "c"), ("e", "f"),
      ("e", "d"), ("d", "a"), ("a", "e")).flatMap(p => Seq(p, p.swap))
    assert(!und.exists { case (s, d) => local(s) && local(d) })
    val all = Set("a", "b", "c", "d", "e", "f", "g")
    assert((all -- local).forall(v => und.exists {
      case (s, d) => s == v && local(d)
    } || v == "g" && local("g")), s"not maximal: $local")
  }

  test("scc: local tail == distributed supersteps (cycles, tails, string ids, cap)") {
    // mixed structure: a 3-cycle, a 2-cycle, a chain tail, an isolate
    val v = Seq("a", "b", "c", "d", "e", "f", "g", "h").toDF("id")
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), // 3-cycle
      ("d", "e"), ("e", "d"), // 2-cycle
      ("c", "d"), ("e", "f"), ("f", "h")) // bridges + tail (g isolated)
      .toDF("src", "dst")
    def scc(threshold: Long, cap: Int = 100): Map[String, Long] =
      GraphFrame(v, e).stronglyConnectedComponents.maxIter(cap)
        .setSmallGraphThreshold(threshold).run()
        .select("id", "component").as[(String, Long)].collect().toMap
    val local = scc(100000)
    val dist = scc(0)
    assert(local == dist, s"$local vs $dist")
    // outer-round cap truncation must match too (cap 1: one peel round)
    assert(scc(100000, cap = 1) == scc(0, cap = 1))
  }

  test("hits: two hubs pointing at one authority (hand-computed fixpoint)") {
    val v = Seq("a", "b", "c").toDF("id")
    val e = Seq(("a", "c"), ("b", "c")).toDF("src", "dst")
    val m = GraphFrame(v, e).hits.maxIter(3).run()
      .select("id", "hub", "authority").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val s2 = 1.0 / math.sqrt(2)
    assert(math.abs(m("c")._2 - 1.0) < 1e-12)   // sole authority
    assert(math.abs(m("a")._1 - s2) < 1e-12)    // symmetric hubs
    assert(math.abs(m("b")._1 - s2) < 1e-12)
    assert(m("c")._1 === 0.0 && m("a")._2 === 0.0 && m("b")._2 === 0.0)
  }

  test("hits: empty edge set yields all-zero scores, not NaN") {
    val g = GraphFrame(Seq(1L, 2L).toDF("id"),
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    val rows = g.hits.maxIter(2).run().select("hub", "authority").collect()
    assert(rows.forall(r => r.getDouble(0) === 0.0 && r.getDouble(1) === 0.0))
  }

  test("katz: hand-computed chain fixpoint") {
    val v = Seq("a", "b", "c").toDF("id")
    val e = Seq(("a", "b"), ("b", "c")).toDF("src", "dst")
    val m = GraphFrame(v, e).katz.alpha(0.5).beta(1.0).maxIter(3).run()
      .select("id", "katz").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") === 1.0)
    assert(m("b") === 1.5)
    assert(m("c") === 1.75)
  }

  test("hits/katz: driver-side small-graph tail equals the distributed path " +
      "(isolated vertex, multi-edge, dangling edge)") {
    // friends + a duplicated edge (sums must count it twice) + a dangling
    // edge whose dst is not a vertex (must contribute nothing); Gabby
    // stays isolated (closed-form fill)
    val e = friends.edges.select("src", "dst")
      .unionAll(Seq(("a", "b"), ("b", "zzz-not-a-vertex")).toDF("src", "dst"))
    val g = GraphFrame(friends.vertices, e)
    def hitsMap(th: Long) = g.hits.maxIter(4).setSmallGraphThreshold(th).run()
      .select("id", "hub", "authority").collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2)))).toMap
    val (local, dist) = (hitsMap(100000L), hitsMap(0L))
    assert(local.keySet == dist.keySet)
    local.foreach { case (id, (h, a)) =>
      assert(math.abs(h - dist(id)._1) < 1e-12, s"hub($id)")
      assert(math.abs(a - dist(id)._2) < 1e-12, s"authority($id)")
    }
    assert(local("g") == ((0.0, 0.0))) // isolated: closed-form fill
    def katzMap(th: Long) = g.katz.alpha(0.1).beta(2.0).maxIter(5)
      .setSmallGraphThreshold(th).run()
      .select("id", "katz").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val (kl, kd) = (katzMap(100000L), katzMap(0L))
    kl.foreach { case (id, k) => assert(math.abs(k - kd(id)) < 1e-12, s"katz($id)") }
    assert(kl("g") === 2.0) // isolated: beta every round
  }
}
