package graft

import org.apache.spark.sql.functions._

/** Round-12 surface: shared 2-connectivity pipeline, level-synchronous
 * temporal tail, multi-key blocking, single-evaluation fuzzy verify,
 * CMS null-key hygiene, and the releaseShared hook. */
class Round12Spec extends TestBase {
  import spark.implicits._

  // ---------------- TwoConnectivity shared pipeline ----------------

  test("bridgesAndArticulationPoints equals the separate runs (local tail)") {
    val g = friends
    val (b, a) = g.twoConnectivity.bridgesAndArticulationPoints()
    val b1 = g.twoConnectivity.bridges()
      .as[(String, String, Boolean)].collect().toSet
    val a1 = g.twoConnectivity.articulationPoints()
      .as[(String, Boolean)].collect().toSet
    assert(b.as[(String, String, Boolean)].collect().toSet == b1)
    assert(a.as[(String, Boolean)].collect().toSet == a1)
  }

  test("bridgesAndArticulationPoints: ONE forced-distributed pipeline " +
      "matches the driver-tail invariants") {
    // tree 0-1, 0-2, 1-3, 1-4 plus chord 3-4: bridges = 0-1? no — the
    // chord closes the 1-3-4 cycle, so bridges are 0-1 and 0-2; cut
    // vertices are 0 (root, two subtrees) and 1 (3,4 escape only to 1)
    val v = (0L to 4L).toDF("id")
    val e = Seq((0L, 1L), (0L, 2L), (1L, 3L), (1L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val g = GraphFrame(v, e)
    val (bd, ad) = g.twoConnectivity.setSmallGraphThreshold(0)
      .bridgesAndArticulationPoints()
    val bridges = bd.filter(col("is_bridge"))
      .as[(Long, Long, Boolean)].collect().map(t => (t._1, t._2)).toSet
    assert(bridges == Set((0L, 1L), (0L, 2L)), bridges.toString)
    val arts = ad.filter(col("is_articulation")).as[(Long, Boolean)]
      .collect().map(_._1).toSet
    assert(arts == Set(0L, 1L), arts.toString)
    // and the local tail agrees on the same graph
    val (bl, al) = g.twoConnectivity.bridgesAndArticulationPoints()
    assert(bl.as[(Long, Long, Boolean)].collect().toSet ==
      bd.as[(Long, Long, Boolean)].collect().toSet)
    assert(al.as[(Long, Boolean)].collect().toSet ==
      ad.as[(Long, Boolean)].collect().toSet)
  }

  // ---------------- level-synchronous temporal tail ----------------

  test("temporal tail matches distributed rounds when maxIter binds") {
    // chain 0 -(t1)-> 1 -(t2)-> 2 -(t3)-> 3, edge list ordered so an
    // in-place sweep would propagate ALL hops in one pass; at maxIter=1
    // only the 1-hop arrival exists on BOTH paths
    val v = (0L to 3L).toDF("id")
    val e = Seq((0L, 1L, 1.0), (1L, 2L, 2.0), (2L, 3L, 3.0))
      .toDF("src", "dst", "time")
    def arr(threshold: Long, iters: Int) =
      new lib.TemporalReachability(GraphFrame(v, e))
        .source(0L).startTime(0.0).timeCol("time").maxIter(iters)
        .setSmallGraphThreshold(threshold).run()
        .collect().map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) -1.0 else r.getDouble(1))).toMap
    val tail1 = arr(1000000, 1)
    val dist1 = arr(0, 1)
    assert(tail1 == dist1, s"$tail1 vs $dist1")
    assert(tail1 == Map(0L -> 0.0, 1L -> 1.0, 2L -> -1.0, 3L -> -1.0),
      tail1.toString)
    val tail2 = arr(1000000, 2)
    assert(tail2 == arr(0, 2), s"maxIter=2 parity")
    assert(tail2(2L) == 2.0 && tail2(3L) == -1.0, tail2.toString)
  }

  // ---------------- multi-key blocking ----------------

  test("multi-key fuzzyPairs unions blocks, dedups pairs, caps per key") {
    val rows = Seq(
      (1L, "abcd", "p", "x"), (2L, "abce", "p", "y"), // share key 1 only
      (3L, "abcf", "q", "y"),                         // pairs with 2 via key 2
      (4L, "zzzz", "q", "x"),                         // blocked with 3, dist 4
      (5L, null.asInstanceOf[String], "r", null.asInstanceOf[String]))
      .toDF("id", "name", "k1", "k2")
    val got = pipeline.Dedup.fuzzyPairs(rows, "id", "name",
        Seq(col("k1"), col("k2")), maxDist = 1, maxBlock = 10)
      .as[(Long, Long, Int)].collect().toList
    // (1,2) via k1 "p"; (2,3) via k2 "y"; (3,4) via k1 "q" fails verify;
    // (1,4) via k2 "x" fails verify; null text rows never emit (null
    // levenshtein -> empty filter array); exactly ONE row per pair
    assert(got.sorted == List((1L, 2L, 1), (2L, 3L, 1)), got.toString)
    // per-key cap: k1 block "q" dropped at maxBlock=2 keeps the k2 pairs
    val capped = pipeline.Dedup.fuzzyPairs(
        rows.union(Seq((6L, "abcg", "q", "w")).toDF("id", "name", "k1", "k2")),
        "id", "name", Seq(col("k1"), col("k2")), maxDist = 1, maxBlock = 2)
      .as[(Long, Long, Int)].collect().toList
    assert(capped.sorted == List((1L, 2L, 1), (2L, 3L, 1)), capped.toString)
  }

  test("multi-key fuzzyPairs: same value under different keys never blocks") {
    val rows = Seq((1L, "aa", "v", "w"), (2L, "ab", "w", "v"))
      .toDF("id", "name", "k1", "k2")
    // row1.k1 = row2.k2 = "v" but key spaces are disjoint -> no candidate
    val got = pipeline.Dedup.fuzzyPairs(rows, "id", "name",
      Seq(col("k1"), col("k2")), maxDist = 2, maxBlock = 10).count()
    assert(got == 0)
  }

  // ---------------- single-evaluation verify ----------------

  test("fuzzyPairs evaluates levenshtein once per candidate pair") {
    val rows = Seq((1L, "aa", "k"), (2L, "ab", "k")).toDF("id", "name", "blk")
    val plan = pipeline.Dedup.fuzzyPairs(rows, "id", "name", col("blk"),
        maxDist = 1, maxBlock = 10)
      .queryExecution.executedPlan.toString
    val n = "levenshtein".r.findAllIn(plan.toLowerCase).size
    assert(n == 1, s"levenshtein appears $n times in the physical plan:\n$plan")
  }

  // ---------------- CMS null-key hygiene ----------------

  test("cmsEstimate drops null candidate keys like cmsCounters") {
    val data = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "key")
    val counters = pipeline.Sketches.cmsCounters(data, "key", 4, 64)
    val keys = Seq(Some("x"), None, Some("y")).toDF("key")
    val est = pipeline.Sketches.cmsEstimate(counters, keys, "key", 4, 64)
      .collect()
    assert(!est.exists(_.isNullAt(0)), "null key row leaked into estimates")
    assert(est.map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("x" -> 2L, "y" -> 1L))
  }

  // ---------------- releaseShared hook ----------------

  test("releaseShared frees operator-internal persists after consumption") {
    spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
    val before = spark.sparkContext.getPersistentRDDs.keySet.toSet
    val rows = Seq((1L, "aa", "k"), (2L, "ab", "k"), (3L, "ba", "j"))
      .toDF("id", "name", "blk")
    val result = pipeline.Dedup.fuzzyPairs(rows, "id", "name", col("blk"),
      maxDist = 1, maxBlock = 10)
    result.count() // materializes; pins the internal block-filtered frame
    val pinned = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(pinned.nonEmpty, "expected fuzzyPairs to pin its shared frame")
    pipeline.releaseShared(result)
    val after = spark.sparkContext.getPersistentRDDs.keySet.toSet -- before
    assert(after.isEmpty, s"still pinned after releaseShared: $after")
  }

  test("releaseShared on a plan with no cached subtrees is a no-op") {
    val df = Seq(1, 2, 3).toDF("x").filter(col("x") > 1)
    df.count()
    pipeline.releaseShared(df) // must not throw
    assert(df.count() == 2)
  }

  // ---------------- maximal matching ----------------

  test("maximalMatching: matching, maximal, and tail == distributed") {
    // two triangles joined by a bridge — a matching has <= 3 edges
    val v = (0L to 5L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L),
      (4L, 5L), (5L, 3L)).toDF("src", "dst")
    val g = GraphFrame(v, e)
    def run(threshold: Long) = g.maximalMatching.seed(7L)
      .setSmallGraphThreshold(threshold).run()
      .as[(Long, Long, Int)].collect().toSet
    val tail = run(1000000)
    val dist = run(0)
    assert(tail == dist, s"$tail vs $dist")
    // matching: no two edges share a vertex
    val verts = tail.toSeq.flatMap(t => Seq(t._1, t._2))
    assert(verts.distinct.size == verts.size, tail.toString)
    // maximal: every graph edge touches a matched vertex
    val matched = verts.toSet
    Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 3L))
      .foreach { case (a, b) =>
        assert(matched(a) || matched(b), s"edge ($a,$b) escaped the matching")
      }
  }

  test("weighted maximalMatching picks locally dominant edges") {
    val v = (0L to 2L).toDF("id")
    val e = Seq((0L, 1L, 1.0), (1L, 2L, 5.0), (0L, 2L, 1.0))
      .toDF("src", "dst", "w")
    val g = GraphFrame(v, e)
    def run(th: Long) = g.maximalMatching.weightCol("w")
      .setSmallGraphThreshold(th).run()
      .as[(Long, Long, Double, Int)].collect().toSet
    // the heaviest edge (1,2) dominates both its endpoints in round 0 and
    // blocks the rest of the triangle — the Preis greedy pick
    val tail = run(1000000)
    assert(tail == Set((1L, 2L, 5.0, 0)), tail.toString)
    assert(run(0) == tail, "weighted tail != distributed")
  }

  test("maximalMatching on a single edge matches it in round 0") {
    val g = GraphFrame((0L to 1L).toDF("id"), Seq((0L, 1L)).toDF("src", "dst"))
    val got = g.maximalMatching.run().as[(Long, Long, Int)].collect().toSeq
    assert(got == Seq((0L, 1L, 0)), got.toString)
  }

  // ---------------- voronoi ----------------

  test("voronoi assigns closest seed, ties to smaller seed, null unreachable") {
    // chain 0->1->2->3->4 with seeds {0, 4}: distance is measured FROM the
    // vertex TO the seed along directed edges, so only 4 is reachable
    // (everyone reaches 4 downstream; nobody reaches 0 except itself)
    val g = chain(5)
    val got = g.voronoi(Seq(0L, 4L)).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1),
        if (r.isNullAt(2)) -1 else r.getInt(2))).toMap
    assert(got == Map(0L -> (0L, 0), 1L -> (4L, 3), 2L -> (4L, 2),
      3L -> (4L, 1), 4L -> (4L, 0)), got.toString)
  }

  // ---------------- budgetSelect ----------------

  test("budgetSelect keeps the in-budget prefix per group") {
    val rows = Seq((1L, "a", 5L), (2L, "a", 4L), (3L, "a", 3L),
      (4L, "b", 100L), (5L, "b", 1L)).toDF("id", "grp", "toks")
    val got = pipeline.Sampling.budgetSelect(rows, "id", "grp", "toks",
        "toks", budgetPerGroup = 9L)
      .as[(Long, String, Long, Long, Long)].collect().toSet
    // group a: 5 (cum 5), 4 (cum 9) kept; 3 (cum 12) cut.
    // group b: 100 over budget at rank 1 -> prefix empty (1L never
    // reconsidered: prefix-cut, not skip-and-continue)
    assert(got == Set((1L, "a", 5L, 1L, 5L), (2L, "a", 4L, 2L, 9L)),
      got.toString)
  }

  // ---------------- hashSplit ----------------

  test("hashSplit covers every row and is stable under corpus growth") {
    val fr = Map("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = pipeline.Sampling.hashSplit((1L to 200L).toDF("id"), "id", fr)
      .as[(Long, String)].collect().toMap
    assert(s1.size == 200 &&
      s1.values.toSet.subsetOf(Set("train", "val", "test")))
    val s2 = pipeline.Sampling.hashSplit((1L to 400L).toDF("id"), "id", fr)
      .as[(Long, String)].collect().toMap
    // doubling the corpus must not move any existing row between splits
    assert((1L to 200L).forall(i => s2(i) == s1(i)), "growth moved rows")
    val train = s2.values.count(_ == "train")
    assert(train > 400 * 0.7 && train < 400 * 0.9, s"train=$train")
    intercept[IllegalArgumentException] {
      pipeline.Sampling.hashSplit((1L to 5L).toDF("id"), "id", Map("a" -> 0.5))
    }
  }

  // ---------------- shuffleShards ----------------

  test("shuffleShards is a complete, deterministic permutation per shard") {
    val ids = (1L to 100L).toDF("id")
    val s1 = pipeline.Sampling.shuffleShards(ids, "id", numShards = 4)
      .as[(Long, Int, Long)].collect()
    assert(s1.length == 100 && s1.map(_._1).distinct.length == 100)
    // per shard: positions are exactly 0..size-1
    s1.groupBy(_._2).foreach { case (shard, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (0L until rows.length).toSeq,
        s"shard $shard positions not contiguous")
    }
    // deterministic across runs; different seed permutes differently
    val s2 = pipeline.Sampling.shuffleShards(ids, "id", numShards = 4)
      .as[(Long, Int, Long)].collect()
    assert(s1.sortBy(_._1).toSeq == s2.sortBy(_._1).toSeq)
    val s3 = pipeline.Sampling.shuffleShards(ids, "id", numShards = 4, seed = 7L)
      .as[(Long, Int, Long)].collect()
    assert(s3.sortBy(_._1).toSeq != s1.sortBy(_._1).toSeq)
  }

  // ---------------- DSIR weights ----------------

  test("dsirWeights scores target-like docs above off-target docs") {
    // long docs so the add-α·B smoothing mass (0.5·64 = 32) stays minor
    // next to the real bigram counts
    val docs = Seq(
      (1L, ("alpha beta " * 30).trim, true),
      (2L, ("alpha beta " * 20).trim, true),
      (3L, ("alpha beta " * 10).trim, false), // target-like raw doc
      (4L, ("gamma delta " * 30).trim, false),
      (5L, "x", false) // < 2 tokens -> weight 0
    ).toDF("id", "text", "is_tgt")
    val got = pipeline.Text.dsirWeights(docs, "id", "text", col("is_tgt"),
        buckets = 64, alpha = 0.5)
      .as[(Long, Long, Double)].collect().map(t => t._1 -> t._3).toMap
    assert(got(3L) > got(4L),
      s"target-like doc should outweigh off-target: $got")
    assert(got(5L) == 0.0, got.toString)
    assert(got(1L) > 0.0 && got(4L) < 0.0, got.toString)
  }

  // ---------------- streaming KMV across micro-batches ----------------

  test("kmvDistinctStream merges KMV state across micro-batches") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t0 = 1700000000000L - (1700000000000L % 3600000L)
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "event_type", "ms")
      .withColumn("ts_utc", timestamp_millis(col("ms")))
    val out = streaming.EventStreams.kmvDistinctStream(ev, k = 16,
      complete = true)
    val sink = s"kmv_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      // 10 distinct users in batch 1, 5 overlapping + 5 new in batch 2:
      // 15 distinct < k = 16, so the estimate is the EXACT distinct count
      in.addData((1L to 10L).map(u => (u, "click", t0 + u)))
      q.processAllAvailable()
      in.addData((6L to 15L).map(u => (u, "click", t0 + 100 + u)))
      q.processAllAvailable()
      val est = spark.table(sink)
        .select("event_type", "approx_distinct")
        .as[(String, Double)].collect().toMap
      assert(est == Map("click" -> 15.0), est.toString)
    } finally q.stop()
  }

  // ---------------- KMV distinct aggregator ----------------

  test("distinctLong KMV buffer is duplicate-insensitive") {
    val kmin = expressions.KMinSampling.distinctLong(4)
    val dups = (1 to 50).flatMap(_ => Seq(10L, 20L, 30L)).toDF("v")
      .agg(kmin(col("v"))).as[Seq[Long]].head()
    assert(dups == Seq(10L, 20L, 30L), dups.toString)
    val many = (1L to 100L).flatMap(x => Seq(x, x)).toDF("v")
      .agg(kmin(col("v"))).as[Seq[Long]].head()
    assert(many == Seq(1L, 2L, 3L, 4L), many.toString)
  }
}
