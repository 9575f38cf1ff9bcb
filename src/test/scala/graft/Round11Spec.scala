package graft

import org.apache.spark.sql.functions._

/** Round-11 operators: negative sampling, dHash, overlap chunking,
 * Markov transitions, co-purchase recommendations, blocked fuzzy ER,
 * Count-Min Sketch, clique listing, and the DSv2 R-MAT source. */
class Round11Spec extends TestBase {
  import spark.implicits._

  // ---------------- NegativeSampling ----------------

  test("negativeSamples returns only non-edges, k per vertex, deterministic") {
    val g = chain(8) // 0->1->...->7
    val out = new embeddings.NegativeSampling(g).setK(2).setSeed(7L).run()
      .select(col("src").cast("long"), col("dst").cast("long"), col("draw"))
      .as[(Long, Long, Int)].collect()
    val edges = (0L until 7L).flatMap(i => Seq((i, i + 1), (i + 1, i))).toSet
    assert(out.nonEmpty)
    out.foreach { case (s, d, _) =>
      assert(s != d)
      assert(!edges.contains((s, d)), s"sampled a true edge: $s -> $d")
    }
    assert(out.groupBy(_._1).values.forall(_.length <= 2))
    val again = new embeddings.NegativeSampling(g).setK(2).setSeed(7L).run()
      .select(col("src").cast("long"), col("dst").cast("long"), col("draw"))
      .as[(Long, Long, Int)].collect()
    assert(out.sorted.toSeq == again.sorted.toSeq)
  }

  test("negativeSamples directed mode rejects only the existing direction") {
    val g = chain(3) // edges 0->1, 1->2
    val out = new embeddings.NegativeSampling(g).setK(5).setCandidates(40)
      .setUndirected(false).setSeed(1L).run()
      .select(col("src").cast("long"), col("dst").cast("long"))
      .as[(Long, Long)].collect().toSet
    assert(!out.contains((0L, 1L)) && !out.contains((1L, 2L)))
    // reverse directions are legal negatives in directed mode
    assert(out.contains((1L, 0L)) || out.contains((2L, 1L)) || out.contains((2L, 0L)))
  }

  test("negativeSamples requires numeric ids") {
    intercept[IllegalArgumentException] {
      new embeddings.NegativeSampling(friends).run()
    }
  }

  // ---------------- imageDHash ----------------

  private def png(w: Int, h: Int)(rgb: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, rgb(x, y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  test("imageDHash: uniform image is all zeros; gradient is all ones; " +
      "brightness shift cancels") {
    val flat = png(18, 18)((_, _) => 0x808080)
    val grad = png(18, 18)((x, _) => { val v = 250 - x * 10; (v << 16) | (v << 8) | v })
    val gradDim = png(18, 18)((x, _) => { val v = 150 - x * 5; (v << 16) | (v << 8) | v })
    val df = Seq((1L, flat), (2L, grad), (3L, gradDim)).toDF("id", "img")
    val got = multimodal.Multimodal.imageDHash(df, "id", "img")
      .select(col("id"), col("dhash")).as[(Long, String)].collect().toMap
    assert(got(1L) == "0" * 64)
    assert(got(2L) == "1" * 64) // strictly decreasing left->right
    assert(got(3L) == "1" * 64) // same gradient sign at half brightness
  }

  test("imageDHash: undecodable payload yields null hash, decoded=false") {
    val df = Seq((9L, Array[Byte](1, 2, 3))).toDF("id", "img")
    val r = multimodal.Multimodal.imageDHash(df, "id", "img").collect()(0)
    assert(r.isNullAt(1) && !r.getBoolean(2))
  }

  // ---------------- ngramNovelty ----------------

  test("ngramNovelty: unique-shingle share, short docs get null novelty") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c x"), (3L, "q"))
      .toDF("doc_id", "text")
    val got = pipeline.Text.ngramNovelty(docs, "doc_id", "text", n = 3)
      .select(col("doc_id"), col("n_shingles"), col("n_unique"), col("novelty"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1.0 else r.getDouble(3))).toSet
    // "a b c" is shared; "b c d" / "b c x" are unique to their docs
    assert(got == Set((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5),
      (3L, 0L, 0L, -1.0)), got.toString)
  }

  // ---------------- tfCosinePairs ----------------

  test("tfCosinePairs: exact integer dot/norms, stop-term cap") {
    val docs = Seq((1L, "a a b"), (2L, "a a b"), (3L, "z z z"))
      .toDF("doc_id", "text")
    val got = pipeline.Text.tfCosinePairs(docs, "doc_id", "text",
        minCosine = 0.9, maxDocFreq = 1000)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 5L, 1.0)), got.toString) // dot 2·2+1·1, cos 1
    // df("a") = df("b") = 2 > maxDocFreq=1 -> cut as stop terms, no pairs
    assert(pipeline.Text.tfCosinePairs(docs, "doc_id", "text",
      minCosine = 0.1, maxDocFreq = 1).count() == 0)
  }

  // ---------------- transitionMatrix ----------------

  test("transitionMatrix counts within-session transitions only") {
    val h = 3600L * 1000000000L // ns per hour
    val ev = Seq(
      // user 1, one session: a -> b -> a
      (1L, 1L * h, 1L, "a"), (2L, 1L * h + 1, 1L, "b"), (3L, 1L * h + 2, 1L, "a"),
      // user 1, second session (2h gap): b -> b
      (4L, 3L * h, 1L, "b"), (5L, 3L * h + 1, 1L, "b"),
      // user 2: a -> b
      (6L, 1L * h, 2L, "a"), (7L, 1L * h + 1, 2L, "b"))
      .toDF("event_id", "ts", "user_id", "event_type")
    val got = pipeline.Events.transitionMatrix(ev, gapMinutes = 30)
      .select(col("src_type"), col("dst_type"), col("n"), col("n_src"), col("p"))
      .as[(String, String, Long, Long, Double)].collect().toSet
    // a->b twice, b->a once, b->b once; NO b->b from session boundary of user 1
    assert(got == Set(
      ("a", "b", 2L, 2L, 1.0),
      ("b", "a", 1L, 2L, 0.5),
      ("b", "b", 1L, 2L, 0.5)), got.toString)
  }

  // ---------------- Recommend ----------------

  test("coOccurrence + alsoBought: canonical counts, basket cap, top-k ties") {
    val lines = Seq(
      (10L, "a"), (10L, "b"), (10L, "c"), (10L, "a"), // dup line counts once
      (11L, "a"), (11L, "b"),
      (12L, "a"), (12L, "b"),
      (13L, "a"), (13L, "b"), (13L, "c"), (13L, "d")) // dropped at maxBasket=3
      .toDF("order_id", "item")
    val pairs = pipeline.Recommend.coOccurrence(lines, "order_id", "item",
      maxBasket = 3)
      .as[(String, String, Long)].collect().toSet
    assert(pairs == Set(("a", "b", 3L), ("a", "c", 1L), ("b", "c", 1L)), pairs.toString)
    val top = pipeline.Recommend.alsoBought(
        pipeline.Recommend.coOccurrence(lines, "order_id", "item", 3), k = 1)
      .select(col("item"), col("also_bought"), col("n_baskets"), col("rank"))
      .as[(String, String, Long, Long)].collect().toSet
    assert(top == Set(
      ("a", "b", 3L, 1L), ("b", "a", 3L, 1L), ("c", "a", 1L, 1L)), top.toString)
  }

  // ---------------- fuzzyPairs ----------------

  test("fuzzyPairs verifies within blocks and drops oversized blocks") {
    val rows = Seq(
      (1L, "Customer#01"), (2L, "Customer#02"), (3L, "Customer#11"),
      (4L, "Supplier#01"), (5L, "Supplier#01"),
      // block "X" has 3 rows -> dropped at maxBlock=2
      (6L, "X1"), (7L, "X2"), (8L, "X3")).toDF("id", "name")
    val blk = substring(col("name"), 1, 1)
    val got = pipeline.Dedup.fuzzyPairs(rows, "id", "name", blk,
        maxDist = 1, maxBlock = 2)
      .as[(Long, Long, Int)].collect().toSet
    // C-block has 3 rows (> 2) too -> dropped; S-block pair dist 0
    assert(got == Set((4L, 5L, 0)), got.toString)
    val loose = pipeline.Dedup.fuzzyPairs(rows, "id", "name", blk,
        maxDist = 1, maxBlock = 10)
      .as[(Long, Long, Int)].collect().toSet
    assert(loose == Set((1L, 2L, 1), (1L, 3L, 1), (4L, 5L, 0), (6L, 7L, 1),
      (6L, 8L, 1), (7L, 8L, 1)), loose.toString)
  }

  // ---------------- Count-Min Sketch ----------------

  test("cmsTopK: wide sketch is exact; narrow sketch only overestimates") {
    val data = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(2)("z") ++
      Seq("w")).zipWithIndex.map { case (k, i) => (i.toLong, k) }
      .toDF("id", "key")
    val top = pipeline.Sketches.cmsTopK(data, "key", k = 3, depth = 4,
        width = 4096)
      .select(col("key"), col("est"), col("rank"))
      .as[(String, Long, Long)].collect().toSeq
    assert(top == Seq(("x", 5L, 1L), ("y", 3L, 2L), ("z", 2L, 3L)), top.toString)
    val exact = Map("x" -> 5L, "y" -> 3L, "z" -> 2L, "w" -> 1L)
    val narrow = pipeline.Sketches
      .cmsEstimate(pipeline.Sketches.cmsCounters(data, "key", 2, 2),
        data.select("key"), "key", 2, 2)
      .as[(String, Long)].collect()
    narrow.foreach { case (k, est) =>
      assert(est >= exact(k), s"CMS underestimated $k: $est < ${exact(k)}")
    }
  }

  test("cms counter table is bounded by depth x width") {
    val data = (1 to 500).map(i => (i.toLong, s"k$i")).toDF("id", "key")
    val n = pipeline.Sketches.cmsCounters(data, "key", depth = 3, width = 8).count()
    assert(n <= 24, s"counter table has $n rows")
  }

  // ---------------- conductance ----------------

  test("conductance: cut / min(vol, 2m - vol) per community") {
    // two triangles bridged by 2-3; communities = the triangles
    val v = Seq((0L, "A"), (1L, "A"), (2L, "A"), (3L, "B"), (4L, "B"), (5L, "B"))
      .toDF("id", "com")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L),
      (2L, 3L)).toDF("src", "dst")
    val got = GraphFrame(v, e).conductance("com")
      .as[(String, Long, Long, Long, Double)].collect().toSet
    // each side: vol 7, cut 1, internal 3; 2m = 14 -> 1/7
    assert(got == Set(("A", 7L, 1L, 3L, 0.142857), ("B", 7L, 1L, 3L, 0.142857)),
      got.toString)
    // one community holding everything: cut 0 but min(vol, 2m-vol) = 0
    val all = GraphFrame(v.withColumn("com", lit("X")), e).conductance("com")
      .collect()
    assert(all.length == 1 && all(0).isNullAt(4))
  }

  // ---------------- Cliques ----------------

  test("triangles and cliques4 on two bridged K4s") {
    val g = twoBlobs(4)
    val tri = lib.Cliques.triangles(g)
      .as[(Long, Long, Long)].collect().toSet
    val expectTri = (for {
      base <- Seq(0L, 4L)
      c <- Seq(0L, 1L, 2L, 3L).combinations(3)
    } yield (c(0) + base, c(1) + base, c(2) + base)).toSet
    assert(tri == expectTri, tri.toString)
    val quads = lib.Cliques.cliques4(g)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(quads == Set((0L, 1L, 2L, 3L), (4L, 5L, 6L, 7L)), quads.toString)
  }

  test("cliques4 finds nothing on a triangle-free graph") {
    assert(lib.Cliques.cliques4(chain(6)).count() == 0)
    assert(lib.Cliques.triangles(star(5)).count() == 0)
  }

  // ---------------- TemporalReachability ----------------

  test("temporal reachability respects non-decreasing edge times") {
    val v = (0L to 3L).toDF("id")
    val e = Seq((0L, 1L, 5.0), (1L, 2L, 3.0), (1L, 2L, 7.0), (0L, 3L, 1.0))
      .toDF("src", "dst", "time")
    val got = new lib.TemporalReachability(GraphFrame(v, e))
      .source(0L).startTime(0.0).timeCol("time").run()
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    // arrive at 1 at t=5; the t=3 edge to 2 already departed -> t=7 wins
    assert(got == Map(0L -> 0.0, 1L -> 5.0, 2L -> 7.0, 3L -> 1.0), got.toString)
  }

  test("temporal reachability: driver tail equals the distributed rounds") {
    val v = (0L to 5L).toDF("id")
    val e = Seq((0L, 1L, 2.0), (1L, 2L, 1.0), (1L, 3L, 4.0), (3L, 4L, 4.0),
      (4L, 5L, 3.0), (0L, 4L, 9.0)).toDF("src", "dst", "time")
    def arr(threshold: Long) = new lib.TemporalReachability(GraphFrame(v, e))
      .source(0L).startTime(0.0).timeCol("time")
      .setSmallGraphThreshold(threshold).run()
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    assert(arr(0) == arr(1000000), s"${arr(0)} vs ${arr(1000000)}")
    assert(arr(0) == Map(0L -> 0.0, 1L -> 2.0, 2L -> -1.0, 3L -> 4.0,
      4L -> 4.0, 5L -> -1.0), arr(0).toString)
  }

  test("temporal reachability: durations shift arrivals; late start strands") {
    val v = (0L to 2L).toDF("id")
    val e = Seq((0L, 1L, 5.0, 2.0), (1L, 2L, 6.0, 1.0))
      .toDF("src", "dst", "time", "dur")
    val got = new lib.TemporalReachability(GraphFrame(v, e))
      .source(0L).startTime(0.0).timeCol("time").durationCol("dur").run()
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    // arrive 1 at 5+2=7 > 6, so the onward edge already departed
    assert(got == Map(0L -> 0.0, 1L -> 7.0, 2L -> -1.0), got.toString)
    val late = new lib.TemporalReachability(GraphFrame(v, e))
      .source(0L).startTime(9.0).timeCol("time").durationCol("dur").run()
      .filter(col("arrival").isNotNull).count()
    assert(late == 1) // only the source itself
  }

  // ---------------- IndependentCascade ----------------

  test("independent cascade: p=1 is plain BFS; tail equals distributed") {
    val g = chain(5)
    def run(threshold: Long) = new lib.IndependentCascade(g)
      .p(1.0).hashSeed(3L).setSmallGraphThreshold(threshold).run(Seq(0L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val tail = run(1000000)
    assert(tail == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3, 4L -> 4), tail.toString)
    assert(tail == run(0))
  }

  test("independent cascade: coins gate edges deterministically") {
    val g = star(6)
    val a = new lib.IndependentCascade(g).p(0.5).hashSeed(7L).run(Seq(0L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    val b = new lib.IndependentCascade(g).p(0.5).hashSeed(7L).run(Seq(0L))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1 else r.getInt(1))).toMap
    assert(a == b) // same hash seed -> same cascade
    val reached = a.count(_._2 >= 1)
    assert(reached >= 1 && reached < 6, a.toString) // p=.5 gates SOME leaves
    intercept[IllegalArgumentException] {
      new lib.IndependentCascade(g).run(Nil)
    }
  }

  // ---------------- rangeJoin ----------------

  test("rangeJoin: inclusive start, exclusive end, keys, bucket spans") {
    val pts = Seq((1L, 1000L * 1000000, 10L), (1L, 5000L * 1000000, 11L),
      (2L, 1000L * 1000000, 12L)).toDF("user_id", "ts", "event_id")
    // nanos Longs (the testdata convention under nanosAsLong)
    val iv = Seq((1L, 1000L * 1000000, 5000L * 1000000, 100L),
      (2L, 2000L * 1000000, 1000L * 1000000, 200L)) // empty interval
      .toDF("user_id", "s", "e", "iv_id")
    val got = pipeline.Events.rangeJoin(pts, iv, Seq("user_id"), "ts",
        "s", "e", Seq("iv_id"), bucketMs = 700L)
      .select(col("event_id"), col("r_iv_id"))
      .as[(Long, Long)].collect().toSet
    // pt 10 at 1000ms: 1000 <= 1000 < 5000 -> match; pt 11 at 5000ms:
    // exclusive end -> no; pt 12: its user's interval is empty -> no
    assert(got == Set((10L, 100L)), got.toString)
  }

  test("rangeJoin fails loudly on an interval spanning too many buckets") {
    val pts = Seq((1L, 0L, 1L)).toDF("user_id", "ts", "event_id")
    val iv = Seq((1L, 0L, 3600L * 1000000000L, 9L)).toDF("user_id", "s", "e", "iv_id")
    val ex = intercept[Exception] {
      pipeline.Events.rangeJoin(pts, iv, Seq("user_id"), "ts", "s", "e",
        Seq("iv_id"), bucketMs = 10L, maxBucketsPerInterval = 4).collect()
    }
    assert(ex.getMessage != null && ex.getMessage.contains("rangeJoin"),
      String.valueOf(ex.getMessage))
  }

  // ---------------- DSv2 R-MAT source ----------------

  test("graft.rmat pushes edge_id range filters into generation") {
    val src = spark.read.format("graft.rmat")
      .option("scale", 4).option("numEdges", 1000000)
      .option("numPartitions", 4).load()
    val pruned = src.filter(col("edge_id") >= 10 && col("edge_id") < 20)
    assert(pruned.count() == 10)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("range=[10,20)"), plan) // generation itself pruned
    assert(src.filter(col("edge_id") === 5).count() == 1)
  }


  test("graft.rmat DSv2 source matches GraphGenerators.rmat row for row") {
    val viaSource = spark.read.format("graft.rmat")
      .option("scale", 6).option("numEdges", 200).option("seed", 7)
      .option("numPartitions", 5).load()
    val viaExpr = sources.GraphGenerators.rmat(spark, scale = 6,
      numEdges = 200, seed = 7)
    assert(viaSource.schema == viaExpr.schema)
    val a = viaSource.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    val b = viaExpr.as[(Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
    assert(viaSource.rdd.getNumPartitions == 5)
  }

  test("graft.rmat prunes columns and validates options") {
    val src = spark.read.format("graft.rmat")
      .option("scale", 4).option("numEdges", 10).load()
    assert(src.count() == 10)
    assert(src.select("edge_id").as[Long].collect().sorted.toSeq == (0L until 10L))
    val plan = src.select("edge_id").queryExecution.executedPlan.toString
    assert(plan.contains("cols=edge_id"), plan)
    intercept[Exception] {
      spark.read.format("graft.rmat").option("scale", 99).load().collect()
    }
  }
}
