package graft

import org.apache.spark.sql.functions._

class ExtendedSpec extends TestBase {
  import spark.implicits._

  test("undirected motif (a)-[e]-(b) matches both orientations") {
    val df = friends.find("(a)-[e]-(b)")
    assert(df.columns.toSeq == Seq("a", "e", "b", "_direction"))
    assert(df.count() == 16) // 8 edges x 2 orientations
    val pair = df.filter($"a.id" === "b" && $"b.id" === "a")
    assert(pair.select($"_direction").as[String].head() == "rev")
  }

  test("var-length motif (a)-[e*1..2]->(b)") {
    val df = chain(4).find("(a)-[e*1..2]->(b)")
    assert(df.columns.contains("_hop"))
    val hops = df.select($"a.id", $"b.id", $"_hop").as[(Long, Long, Int)].collect().toSet
    assert(hops == Set((0L, 1L, 1), (1L, 2L, 1), (2L, 3L, 1), (0L, 2L, 2), (1L, 3L, 2)))
  }

  test("aggregateNeighbors: per-hop neighbor aggregation") {
    import graft.lib.AggregateNeighbors
    val res = chain(4).aggregateNeighbors
      .agg(count(lit(1)).as("n"), sum(AggregateNeighbors.nbr("id")).as("s"))
      .setMaxHops(2)
      .run()
    val m = res.select("id", "hop", "n", "s").as[(Long, Int, Long, Long)]
      .collect().map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(m((0L, 1)) == ((1L, 1L))) // 0 -> {1}
    assert(m((0L, 2)) == ((1L, 2L))) // 0 -> 1 -> {2}
    assert(m((2L, 1)) == ((1L, 3L)))
    assert(!m.contains((3L, 1))) // sink has no out-neighbors
  }

  test("property graph: namespaced ids + bipartite projection") {
    import graft.propertygraph._
    val users = Seq((1L, "u1"), (2L, "u2")).toDF("uid", "name")
    val items = Seq((1L, "i1"), (2L, "i2")).toDF("iid", "title")
    val rates = Seq((1L, 1L, 5.0), (2L, 1L, 3.0), (2L, 2L, 4.0)).toDF("u", "i", "r")
    val userG = VertexPropertyGroup("user", users, "uid")
    val itemG = VertexPropertyGroup("item", items, "iid")
    val pg = PropertyGraphFrame(Seq(userG, itemG),
      Seq(EdgePropertyGroup("rated", rates, userG, itemG, isDirected = true,
        "u", "i", "r")))
    val g = pg.toGraphFrame
    assert(g.vertices.count() == 4) // user ids never collide with item ids
    assert(g.edges.count() == 3)
    g.validate()
    val proj = pg.bipartiteProjection("rated")
    // users 1 and 2 share item 1
    assert(proj.select("src", "dst", "weight").as[(Long, Long, Long)].collect().toSet ==
      Set((1L, 2L, 1L)))
    // hub cap: item 1 (degree 2) dropped at maxDegree=1 → no pairs remain
    val capped = pg.bipartiteProjection("rated", maxDegree = 1)
    assert(capped.count() == 0)
    // cap above every degree = unchanged
    assert(pg.bipartiteProjection("rated", maxDegree = 2)
      .as[(Long, Long, Long)].collect().toSet == Set((1L, 2L, 1L)))
  }

  test("KMinSampling keeps k smallest-weight values with bounded buffer") {
    import graft.expressions.KMinSampling
    val df = (1L to 100L).map(i => (1L, i * 37 % 101, i)).toDF("g", "w", "v")
    val sample = df.groupBy("g").agg(KMinSampling.sampleLong(5)(col("w"), col("v")).as("s"))
    val got = sample.select("s").as[Seq[Long]].head()
    val expected = (1L to 100L).map(i => (i * 37 % 101, i)).sorted.take(5).map(_._2)
    assert(got == expected)
  }

  test("randomWalks: deterministic, correct length and start") {
    val g = twoBlobs(3)
    val walks = g.randomWalks.setWalkLength(4).setWalksPerVertex(2).setSeed(7L).run()
    assert(walks.count() == 12) // 6 vertices x 2 walks
    val paths = walks.select("random_walk").as[Seq[Long]].collect()
    assert(paths.forall(p => p.length == 5)) // start + 4 hops (no dead ends in blobs)
    // deterministic across runs
    val again = g.randomWalks.setWalkLength(4).setWalksPerVertex(2).setSeed(7L).run()
    assert(walks.orderBy("walk_id").collect().toSeq ==
      again.orderBy("walk_id").collect().toSeq)
    // walks stay within the graph's edges
    val edgeSet = g.edges.as[(Long, Long)].collect().toSet
    paths.foreach { p =>
      p.sliding(2).foreach { case Seq(a, b) =>
        assert(edgeSet.contains((a, b)) || b == p.head) // restart goes to origin
      }
    }
  }

  test("RandomWalkEmbeddings builder: both sequence models, neighbor concat, cleanup") {
    // composite builder parity (reference RandomWalkEmbeddings.scala:46-367)
    val g = twoBlobs(3)
    val w2v = g.randomWalkEmbeddings.setDim(8).setWalkLength(3)
      .setNumWalksPerNode(2).setSeed(7L).run()
    assert(w2v.count() == 6 &&
      w2v.select(size($"embedding")).as[Int].head() == 8)
    val h2v = g.randomWalkEmbeddings.setSequenceModel("hash2vec").setDim(8)
      .setHash2VecSafeL2(false).setWalkLength(3).setSeed(7L).run()
    assert(h2v.select(size($"embedding")).as[Int].head() == 8)
    // neighbor aggregation doubles the width
    val agg = g.randomWalkEmbeddings.setDim(4).setWalkLength(2).setSeed(7L)
      .setAggregateNeighbors(true).setMaxNbrs(4).run()
    assert(agg.select(size($"embedding")).as[Int].collect().forall(_ == 8))
    // injected batched generator + cleanUpAfterRun: result survives, dirs go
    val tmp = java.nio.file.Files.createTempDirectory("rwe").toString
    val rw = g.randomWalks.setBatchSize(2).setNumBatches(2).setWalksPerVertex(1)
      .setSeed(7L).setTemporaryPrefix(tmp)
    val cleaned = g.randomWalkEmbeddings.setRandomWalks(rw).setDim(4)
      .setCleanUpAfterRun(true).run()
    assert(cleaned.count() == 6)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(s"$tmp/${rw.getRunId}_batch_1")))
    // undirected mode reaches blob members against edge direction
    val und = g.randomWalkEmbeddings.setUseEdgeDirections(false)
      .setDim(4).setWalkLength(2).setSeed(7L).run()
    assert(und.count() == 6)
  }

  test("samplingConvolution corner cases ported from SamplingConvolutionSuite") {
    // reference convolutions/SamplingConvolutionSuite.scala:20-117: exact
    // neighbor mean at big sampleSize, reproducibility at small
    // sampleSize, concatenated output width = 2x the input dim
    val emb = (0L to 4L).map(i => (i, (0 until 10).map(d => (i + d).toDouble)))
      .toDF("id", "embedding")
    val g = GraphFrame(emb.select("id"),
      Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
        .toDF("src", "dst"))
    // big sampleSize: vertex 0's out-neighbors {1, 2} average exactly
    val conv = embeddings.Embeddings.samplingConvolution(g, emb, sampleSize = 10, seed = 42L)
    val v0 = conv.filter($"id" === 0L).select("conv_embedding").as[Seq[Double]].head()
    assert(v0.size == 20)
    assert(v0.take(10) == (0 until 10).map(_.toDouble))            // own embedding
    assert(v0.drop(10) == (0 until 10).map(d => (1 + d + 2 + d) / 2.0)) // nbr mean
    // small sampleSize: deterministic for a fixed seed
    def small() = embeddings.Embeddings
      .samplingConvolution(g, emb, sampleSize = 1, seed = 100L)
      .orderBy("id").select("conv_embedding").as[Seq[Double]].collect().toSeq
    assert(small() == small())
    // sink vertex 4: no out-neighbors -> zero-padded second half
    val v4 = conv.filter($"id" === 4L).select("conv_embedding").as[Seq[Double]].head()
    assert(v4.drop(10).forall(_ == 0.0))
  }

  test("randomWalks: batched persist + resume reproduces the uninterrupted run") {
    // reference RandomWalkWithRestartSuite.scala:13-161 — batch-persisted
    // state, resume via (runId, startingFromBatch), cleanUp removes all
    // batch dirs. Hash-derived draws make the resumed run BIT-identical.
    val g = friends
    val tmp = java.nio.file.Files.createTempDirectory("rwbatch").toString
    def runner() = g.randomWalks.setRestartProbability(0.2).setSeed(42L)
      .setBatchSize(3).setNumBatches(2).setWalksPerVertex(2)
      .setTemporaryPrefix(tmp)
    val r1 = runner()
    val w1 = r1.run().orderBy("walk_id").collect().toSeq
    assert(w1.size == 14) // 7 vertices x 2 walks (g isolated: walk stops)
    // resume from batch 2: reads batch-1 state from disk, replays batch 2
    val r2 = runner().setRunId(r1.getRunId).setStartingFromBatch(2)
    val w2 = r2.run().orderBy("walk_id").collect().toSeq
    assert(w1 == w2)
    // both batch dirs exist, then cleanUp removes them
    def dirs() = (1 to 2).count(b =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/${r1.getRunId}_batch_$b")))
    assert(dirs() == 2)
    r1.cleanUp()
    assert(dirs() == 0)
    // walk length = batchSize * numBatches (+ start): non-isolated
    // vertices' walks have 7 entries
    assert(w1.map(_.getSeq[String](1).length).max == 7)
  }

  test("approx triangle count matches exact on small graph") {
    val g = twoBlobs(4)
    val exact = g.triangleCount.run().select("id", "count").as[(Long, Long)].collect().toMap
    val approx = g.triangleCount.runApprox().select("id", "count").as[(Long, Long)].collect().toMap
    assert(exact == approx) // theta sketches are exact below nominal entries
  }

  test("powerIterationClustering separates two blobs") {
    val g = twoBlobs(4).asUndirected()
    val clusters = g.powerIterationClustering(k = 2, maxIter = 30)
    val m = clusters.as[(Long, Int)].collect().toMap
    assert(m.size == 8)
    val c1 = (0L to 3L).map(m).toSet
    val c2 = (4L to 7L).map(m).toSet
    assert(c1.size == 1 && c2.size == 1 && c1 != c2)
  }

  test("ivf ann: valid ranked neighbors with bounded fan-out") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3)
    val rowsOut = ivf.select("query_id", "neighbor_id", "rnk")
      .as[(Long, Long, Int)].collect()
    assert(rowsOut.nonEmpty)
    // at most k per query, ranks contiguous from 1, no self-neighbors
    rowsOut.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_._2 != q))
    }
    // deterministic
    val again = pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3).as[(Long, Long, Int)].collect()
    assert(rowsOut.toSet == again.toSet)
  }

  test("ivf ann: Lloyd refinement stays valid, deterministic and improves centroids") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val refined = pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, lloydIters = 2)
      .as[(Long, Long, Int)].collect()
    assert(refined.nonEmpty)
    refined.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 3 && rs.map(_._3).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_._2 != q))
    }
    val again = pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, lloydIters = 2).as[(Long, Long, Int)].collect()
    assert(refined.toSet == again.toSet, "Lloyd-refined IVF must be deterministic")
    // recall@3 against the exact top-k must not collapse under refinement:
    // refined centroids tighten cells, so candidate lists stay relevant
    val exact = pipeline.Similarity.topK(df, "vec_id", "embedding", k = 3)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    def recall(hits: Iterable[(Long, Long, Int)]) =
      hits.count(r => exact((r._1, r._2))).toDouble / exact.size
    val r0 = recall(pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3).as[(Long, Long, Int)].collect().toSeq)
    val r2 = recall(refined.toSeq)
    assert(r2 >= r0 - 0.1, s"refined recall $r2 collapsed vs seed recall $r0")
  }

  test("lsh similar pairs are a subset of brute-force pairs with identical cosines") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val bf = pipeline.Similarity.bruteForcePairs(df, "vec_id", "embedding", 0.3)
      .as[(Long, Long, Double)].collect().map(r => (r._1, r._2) -> r._3).toMap
    val lsh = pipeline.Similarity.lshSimilarPairs(df, "vec_id", "embedding", 0.3,
      bands = 8, planesPerBand = 4).as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "banded LSH found no candidate pairs at all")
    lsh.foreach { case (a, b, c) =>
      assert(bf.get((a, b)).contains(c), s"pair ($a,$b,$c) not in brute-force set")
    }
    // OR-amplification: more bands can only add candidates
    val lshOne = pipeline.Similarity.lshSimilarPairs(df, "vec_id", "embedding", 0.3,
      bands = 1, planesPerBand = 4).as[(Long, Long, Double)].collect()
    assert(lshOne.map(p => (p._1, p._2)).toSet
      .subsetOf(lsh.map(p => (p._1, p._2)).toSet))
  }

  test("recallAtK: exact-vs-exact is 1.0; silent misses count as 0") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = pipeline.Similarity.topK(df, "vec_id", "embedding", k = 3)
    val self = pipeline.Similarity.recallAtK(exact, exact)
      .as[(Long, Long, Long, Double)].collect()
    assert(self.nonEmpty && self.forall { case (_, ne, nh, r) => ne == nh && r == 1.0 })
    // a query entirely missing from approx must appear with recall 0
    val someQ = self.head._1
    val holey = pipeline.Similarity.recallAtK(
      exact.filter(col("query_id") =!= someQ), exact)
      .as[(Long, Long, Long, Double)].collect().map(t => t._1 -> t._4).toMap
    assert(holey(someQ) == 0.0)
    assert(holey.count(_._2 == 1.0) == self.length - 1)
  }

  test("bandsForRecall: closed form matches the OR-amplification bound") {
    import pipeline.Similarity.{bandCollisionProb, bandsForRecall}
    // identical vectors collide in every band -> one band suffices
    assert(bandCollisionProb(1.0, 4) == 1.0 && bandsForRecall(0.99, 1.0, 4) == 1)
    // the chosen L reaches the target and L-1 does not
    for (target <- Seq(0.5, 0.9, 0.99); cos <- Seq(0.4, 0.6, 0.8)) {
      val p = bandCollisionProb(cos, 4)
      val l = bandsForRecall(target, cos, 4)
      assert(1.0 - math.pow(1.0 - p, l) >= target - 1e-12)
      assert(l == 1 || 1.0 - math.pow(1.0 - p, l - 1) < target)
    }
    // monotone: stricter target or lower cosine never needs fewer bands
    assert(bandsForRecall(0.99, 0.6, 4) >= bandsForRecall(0.9, 0.6, 4))
    assert(bandsForRecall(0.9, 0.4, 4) >= bandsForRecall(0.9, 0.7, 4))
  }

  test("lshTopKForRecall: measured recall improves with the target") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = pipeline.Similarity.topK(df, "vec_id", "embedding", k = 3)
    def measured(target: Double): Double = {
      val approx = pipeline.Similarity.lshTopKForRecall(
        df, "vec_id", "embedding", k = 3, targetRecall = target, atCos = 0.35)
      pipeline.Similarity.recallAtK(approx, exact)
        .agg(avg("recall")).as[Double].head()
    }
    val lo = measured(0.5)
    val hi = measured(0.95)
    assert(hi >= lo, s"recall at target 0.95 ($hi) below target 0.5 ($lo)")
    assert(hi > 0.5, s"high-target LSH recall unexpectedly low: $hi")
  }

  test("hyperplane signature: wide config matches per-row recomputation") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val sig = df.select($"vec_id",
      pipeline.Similarity.hyperplaneSignature(
        $"embedding".cast("array<double>"), planes = 12, dim = 64).as("s"))
      .orderBy("vec_id").limit(5).as[(Long, Long)].collect()
    val vecs = df.orderBy("vec_id").limit(5)
      .select($"vec_id", $"embedding".cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toMap
    sig.foreach { case (id, s) =>
      val v = vecs(id)
      val expected = (0 until 12).map { p =>
        val dot = (0 until 64).map(i => v(i) * pipeline.Similarity.planeSign(p, i)).sum
        if (dot > 0) 1L << p else 0L
      }.sum
      assert(s == expected, s"signature mismatch for vec $id")
    }
  }

  test("ivf ann with Lloyd refinement: contract holds, deterministic") {
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val ivf = pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, lloydIters = 2)
    val rowsOut = ivf.as[(Long, Long, Int)].collect()
    assert(rowsOut.nonEmpty)
    rowsOut.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.length <= 3)
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length))
      assert(rs.forall(_._2 != q))
    }
    val again = pipeline.Similarity.ivfTopK(df, "vec_id", "embedding", k = 3,
      nlist = 8, nprobe = 3, lloydIters = 2).as[(Long, Long, Int)].collect()
    assert(rowsOut.toSet == again.toSet)
  }

  test("toGraphX round-trips topology") {
    val gx = friends.toGraphX
    assert(gx.vertices.count() == 7)
    assert(gx.edges.count() == 8)
    assert(gx.triplets.count() == 8)
  }

  test("fromGraphX builds a GraphFrame from a stock GraphX graph") {
    val sc = spark.sparkContext
    val gx = org.apache.spark.graphx.Graph(
      sc.parallelize(Seq((1L, "a"), (2L, "b"))),
      sc.parallelize(Seq(org.apache.spark.graphx.Edge(1L, 2L, 3.5))))
    val g = GraphFrame.fromGraphX(spark, gx)
    assert(rows(g.vertices) == Set(Seq(1L, "a"), Seq(2L, "b")))
    assert(rows(g.edges) == Set(Seq(1L, 2L, 3.5)))
    // full circle: run an algorithm on the converted graph
    val cc = g.connectedComponents.run()
    assert(cc.select("component").distinct().count() == 1)
  }

  test("typeInDegree and typeDegree pivot per edge type") {
    val t = friends.typeInDegree("relationship", Seq("friend", "follow"))
    val b = t.filter($"id" === "b").select("inDegrees.friend", "inDegrees.follow")
      .as[(Int, Int)].head()
    assert(b == ((1, 1))) // a->b friend, c->b follow
    val d = friends.typeDegree("relationship", Seq("friend", "follow"))
    val a = d.filter($"id" === "a").select("degrees.friend", "degrees.follow")
      .as[(Int, Int)].head()
    assert(a == ((3, 0)))
  }

  test("skewedJoin equals plain join") {
    val g = friends
    val big = g.edges.select($"src".as("k"), $"dst")
    val small = g.vertices.select($"id".as("k"), $"name")
    val plain = big.join(small, "k")
    val skewed = g.skewedJoin(big, small, "k", threshold = 1)
    assert(rows(plain.select("k", "dst", "name")) == rows(skewed.select("k", "dst", "name")))
  }

  test("streaming hourly agg matches batch on static data") {
    import graft.streaming.EventStreams
    val dir = "/root/testdata/sf0.001"
    // complete mode: append-mode would hold back the trailing windows the
    // watermark never passes on a finite input
    val stream = EventStreams.hourlyAggStream(
      EventStreams.readEvents(spark, dir), watermark = "0 seconds", complete = true)
    val q = stream.writeStream.format("memory").queryName("hourly_out")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val got = spark.table("hourly_out")
      .select("event_type", "window_start", "n_events", "sum_value")
    val want = pipeline.Events.hourlyAgg(spark.read.parquet(s"$dir/events.parquet"))
      .select("event_type", "window_start", "n_events", "sum_value")
    assert(rows(got) == rows(want))
  }

  test("text pipeline operators run unchanged on streaming input") {
    // the per-row pipeline ops are pure projections, so the same calls
    // must plan on a stream and emit batch-identical rows
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx = spark.sqlContext
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and the cat"),
      (2L, "email me at a@b.com from 10.0.0.1 please"),
      (3L, "spam spam spam spam spam"))
    val in = MemoryStream[(Long, String)]
    val stream = in.toDF().toDF("doc_id", "text")
    val batch = docs.toDF("doc_id", "text")
    val ops: Seq[(String, org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame)] = Seq(
      ("quality", df => pipeline.Text.quality(df, "doc_id", "text")),
      ("redact", df => pipeline.Text.redactPii(df, "doc_id", "text")),
      ("entropy", df => pipeline.Text.charEntropy(df, "doc_id", "text")),
      ("simhash", df => pipeline.Dedup.simhash(df, "doc_id", "text", bits = 16)))
    in.addData(docs: _*)
    for ((name, op) <- ops) {
      val query = op(stream).writeStream.format("memory")
        .queryName(s"text_stream_$name").outputMode("append").start()
      query.processAllAvailable(); query.stop()
      assert(rows(spark.table(s"text_stream_$name")) == rows(op(batch)),
        s"streaming $name diverged from batch")
    }
  }

  test("streaming sessionization emits all closed sessions") {
    import graft.streaming.EventStreams
    val dir = "/root/testdata/sf0.001"
    val q = EventStreams.sessionizeStream(
        EventStreams.readEvents(spark, dir), gapMinutes = 30,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout)
      .writeStream.format("memory").queryName("sess_out")
      .outputMode("append").start()
    q.processAllAvailable(); q.stop()
    val emitted = spark.table("sess_out")
    // static input arrives as one batch: every session except each user's
    // final one (still open in state) is emitted
    val batch = pipeline.Events.sessionize(
      spark.read.parquet(s"$dir/events.parquet"), gapMinutes = 30)
    val users = batch.select("user_id").distinct().count()
    assert(emitted.count() == batch.count() - users)
    // emitted sessions carry the same (user, n_events, duration) triples
    val got = rows(emitted.select("user_id", "n_events", "duration_ms"))
    val all = rows(batch.select("user_id", "n_events", "duration_ms"))
    assert(got.subsetOf(all))
  }

  test("streaming sessionization: processing-time timeout flushes idle users") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long)] // (user_id, ts_ms)
    val events = in.toDF().toDF("user_id", "ms")
      .withColumn("ts_utc", timestamp_millis($"ms"))
    val q = EventStreams.sessionizeStream(events, gapMinutes = 30,
        timeoutDurationMs = Some(1L)) // fire the idle flush on the next trigger
      .writeStream.format("memory").queryName("sess_timeout")
      .outputMode("append").start()
    // user 1: two events in one session, then goes idle forever. NOTE:
    // processAllAvailable is unusable with processing-time timeouts (the
    // timeout sweep schedules follow-up batches, so "available" never
    // drains) — poll the sink, nudging batches along with another user's
    // events so the engine keeps sweeping timed-out state.
    in.addData((1L, 1000L), (1L, 61000L))
    val deadline = System.currentTimeMillis() + 60000
    var nudge = 0L
    def user1Rows() = spark.table("sess_timeout")
      .filter($"user_id" === 1L)
      .select("user_id", "n_events", "duration_ms").as[(Long, Long, Long)].collect()
    while (user1Rows().isEmpty && System.currentTimeMillis() < deadline) {
      Thread.sleep(300)
      nudge += 1
      in.addData((2L, 1000L + nudge)) // keeps micro-batches (and sweeps) coming
    }
    q.stop()
    assert(user1Rows().toSet == Set((1L, 2L, 60000L)),
      s"timeout flush expected user 1's open session, got ${user1Rows().toSeq}")
  }

  test("streaming dedup keeps first arrival per key within the watermark") {
    import graft.streaming.EventStreams
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(String, Long)] // (content_hash, ts_ms)
    val docs = in.toDF().toDF("fp", "ms")
      .withColumn("ts_utc", timestamp_millis($"ms"))
    val q = EventStreams.dedupStream(docs, Seq("fp"), watermark = "1 hour")
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").start()
    in.addData(("a", 1000L), ("b", 2000L), ("a", 3000L))
    q.processAllAvailable()
    in.addData(("a", 4000L), ("c", 5000L)) // later dup of a + new key
    q.processAllAvailable(); q.stop()
    val kept = spark.table("dedup_out").select("fp").as[String].collect().sorted
    assert(kept.toSeq == Seq("a", "b", "c"), s"got ${kept.toSeq}")
  }

  test("grid Ising belief updates: bounded, deterministic, isolated = tanh(a)") {
    import graft.examples.GridIsing
    val g = GridIsing.gridIsingModel(spark, 4)
    assert(g.vertices.count() == 16 && g.edges.count() == 24)
    g.validate()
    val b1 = GridIsing.beliefUpdates(g, sweeps = 3)
    val vals = b1.select("belief").as[Double].collect()
    assert(vals.forall(v => v >= -1.0 && v <= 1.0))
    val b2 = GridIsing.beliefUpdates(g, sweeps = 3)
    assert(rows(b1.select("id", "belief")) == rows(b2.select("id", "belief")))
    // 1x1 grid has no neighbors: belief = tanh(a)
    val single = GridIsing.beliefUpdates(GridIsing.gridIsingModel(spark, 1), 2)
      .select("a", "belief").as[(Double, Double)].head()
    assert(math.abs(math.tanh(single._1) - single._2) < 1e-12)
  }

  test("sum-product BP: exact marginals on a tree, sane on a loopy grid") {
    import graft.examples.BeliefPropagation
    // tree: 1-2, 1-3, 3-4, 3-5 (bipartite colors by depth)
    val ids = Seq(1, 2, 3, 4, 5)
    val as = Map(1 -> 0.3, 2 -> -0.5, 3 -> 0.2, 4 -> 0.7, 5 -> -0.1)
    val colors = Map(1 -> 0, 2 -> 1, 3 -> 1, 4 -> 0, 5 -> 0)
    val bs = Seq((1, 2, 0.4), (1, 3, -0.6), (3, 4, 0.25), (3, 5, 0.5))
    val v = ids.map(i => (i, as(i), colors(i))).toDF("id", "a", "color")
    val e = bs.toDF("src", "dst", "b")
    val out = BeliefPropagation.sumProduct(GraphFrame(v, e), sweeps = 8)
      .select($"id", $"belief").as[(Int, Double)].collect().toMap
    // exact marginals by enumeration over all 2^5 assignments
    val exact = {
      val states = Seq(-1, 1)
      val all = for {
        x1 <- states; x2 <- states; x3 <- states; x4 <- states; x5 <- states
      } yield Map(1 -> x1, 2 -> x2, 3 -> x3, 4 -> x4, 5 -> x5)
      val weights = all.map { x =>
        val vterm = ids.map(i => as(i) * x(i)).sum
        val eterm = bs.map { case (i, j, b) => b * x(i) * x(j) }.sum
        (x, math.exp(vterm + eterm))
      }
      val z = weights.map(_._2).sum
      ids.map(i => i ->
        weights.filter(_._1(i) == 1).map(_._2).sum / z).toMap
    }
    ids.foreach { i =>
      assert(math.abs(out(i) - exact(i)) < 1e-9,
        s"vertex $i: bp=${out(i)} exact=${exact(i)}")
    }
    // loopy grid: beliefs are proper probabilities and deterministic
    val grid = graft.examples.GridIsing.gridIsingModel(spark, 3)
    val gv = grid.vertices.withColumn("color", pmod($"i" + $"j", lit(2)))
    val g2 = GraphFrame(gv, grid.edges)
    val b1 = BeliefPropagation.sumProduct(g2, sweeps = 4)
      .select($"id", $"belief").as[(String, Double)].collect().toMap
    assert(b1.values.forall(p => p > 0.0 && p < 1.0))
    // repeatable up to float-sum reassociation (aggregation order varies
    // between runs; the driver query rounds to 6 dp for exactly this)
    val b2 = BeliefPropagation.sumProduct(g2, sweeps = 4)
      .select($"id", $"belief").as[(String, Double)].collect().toMap
    b1.foreach { case (k, p) => assert(math.abs(p - b2(k)) < 1e-12) }
  }

  test("multimodal: metadata sniffing + batched feature extraction") {
    import graft.multimodal.Multimodal
    val png = Array[Byte](0x89.toByte, 0x50, 0x4E, 0x47, 1, 2, 3)
    val jpg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0x11, 0x22)
    val df = Seq((1L, png), (2L, jpg)).toDF("id", "payload")
    val meta = Multimodal.attachMeta(df, "id", "payload")
    val m = meta.select($"id", $"media_meta.format", $"media_meta.n_bytes")
      .as[(Long, String, Long)].collect().toMap2
    assert(m(1L) == (("png", 7L)))
    assert(m(2L) == (("jpeg", 4L)))
    // truncated headers parse no dimensions
    val truncDims = meta.select($"media_meta.width", $"media_meta.height")
      .collect()
    assert(truncDims.forall(r => r.isNullAt(0) && r.isNullAt(1)))
    val feats = Multimodal.extractFeatures(df, "id", "payload", dim = 4).collect()
    assert(feats.length == 2 && feats.forall(_.feature.length == 4))
    // deterministic stub
    val feats2 = Multimodal.extractFeatures(df, "id", "payload", dim = 4).collect()
    assert(feats.map(_.feature.toSeq).toSeq == feats2.map(_.feature.toSeq).toSeq)
  }

  test("multimodal: real header dimension parses (PNG IHDR, JPEG SOF walk, GIF)") {
    import graft.multimodal.Multimodal
    def unhex(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG: signature + IHDR with w=0x0203=515, h=0x0105=261
    val png = unhex("89504E470D0A1A0A" + "0000000D" + "49484452" +
      "00000203" + "00000105" + "0802000000" + "DEADBEEF" + "0011223344")
    // JPEG: SOI, APP1 (22 bytes — walk must skip it), progressive SOF2
    // with h=0x0140=320, w=0x00F0=240
    val jpg = unhex("FFD8" + "FFE1" + "0016" + ("00" * 20) +
      "FFC2" + "0011" + "08" + "0140" + "00F0" + "03" +
      "011100021101031101" + "ABCD")
    // JPEG that hits SOS before any SOF: dims stay null
    val jpgNoSof = unhex("FFD8" + "FFE0" + "0004" + "0000" + "FFDA" + "0002" + "99")
    // GIF89a: little-endian w=300 (2C01), h=200 (C800)
    val gif = unhex("474946383961" + "2C01" + "C800" + "F70000")
    // RIFF (e.g. WAV): recognized, no dimensions
    val wav = unhex("52494646" + "24000000" + "57415645")
    val df = Seq((1L, png), (2L, jpg), (3L, jpgNoSof), (4L, gif), (5L, wav))
      .toDF("id", "payload")
    val m = Multimodal.attachMeta(df, "id", "payload")
      .select($"id", $"media_meta.format",
        $"media_meta.width", $"media_meta.height")
      .collect().map(r => r.getLong(0) -> ((r.getString(1),
        if (r.isNullAt(2)) -1 else r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3)))).toMap
    assert(m(1L) == (("png", 515, 261)), s"png: ${m(1L)}")
    assert(m(2L) == (("jpeg", 240, 320)), s"jpeg: ${m(2L)}")
    assert(m(3L) == (("jpeg", -1, -1)), s"jpegNoSof: ${m(3L)}")
    assert(m(4L) == (("gif", 300, 200)), s"gif: ${m(4L)}")
    assert(m(5L) == (("riff", -1, -1)), s"riff: ${m(5L)}")
  }

  test("multimodal: frame sampling and batched resize stubs") {
    import graft.multimodal.Multimodal
    // 10-byte payload, frameSize 4 -> frames at 0,1,2; everyK=2 keeps 0,2
    val df = Seq((1L, "0123456789".getBytes("UTF-8")),
      (2L, Array.empty[Byte])).toDF("id", "payload")
    val frames = Multimodal.sampleFrames(df, "id", "payload", frameSize = 4, everyK = 2)
      .select($"id", $"frame_idx", $"frame".cast("string"))
      .as[(Long, Int, String)].collect().toSet
    assert(frames == Set((1L, 0, "0123"), (1L, 2, "89")),
      s"got $frames") // empty payload yields no frames; tail frame truncated
    val resized = Multimodal.resize(df, "id", "payload", targetBytes = 6)
      .select($"id", $"resized".cast("string")).as[(Long, String)].collect().toMap
    assert(resized(1L) == "012345")
    assert(resized(2L).getBytes("UTF-8").forall(_ == 0) || resized(2L).isEmpty ||
      resized(2L) == " " * 6) // empty input: zero padding
  }

  test("multimodal: REAL image decode via JDK ImageIO — exact stats on PNG") {
    import graft.multimodal.Multimodal
    // 4x2 PNG: left 2 columns (10,20,30), right 2 columns (200,100,50)
    def png(w: Int, h: Int, left: Int, right: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, if (x < w / 2) left else right)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val left = (10 << 16) | (20 << 8) | 30
    val right = (200 << 16) | (100 << 8) | 50
    val df = Seq((1L, png(4, 2, left, right)),
      (2L, "not an image".getBytes("UTF-8")),
      (3L, Array.empty[Byte])).toDF("id", "payload")
    val st = Multimodal.decodeImageStats(df, "id", "payload").collect()
      .map(s => s.id -> s).toMap
    assert(st(1L).decoded && st(1L).width.contains(4) && st(1L).height.contains(2))
    // 4 left pixels + 4 right pixels, exact integer sums
    assert(st(1L).sum_r.contains(4L * 10 + 4L * 200))
    assert(st(1L).sum_g.contains(4L * 20 + 4L * 100))
    assert(st(1L).sum_b.contains(4L * 30 + 4L * 50))
    assert(!st(2L).decoded && st(2L).width.isEmpty)
    assert(!st(3L).decoded)
  }

  test("multimodal: JPEG decodes for real (lossy, so dims exact + means close)") {
    import graft.multimodal.Multimodal
    val img = new java.awt.image.BufferedImage(16, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 12; x <- 0 until 16) img.setRGB(x, y, 0x808080)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val s = Multimodal.decodeImageStats(df, "id", "payload").collect().head
    assert(s.decoded && s.width.contains(16) && s.height.contains(12))
    val meanR = s.sum_r.get.toDouble / s.n_pixels.get
    assert(math.abs(meanR - 128.0) < 4.0, s"jpeg mean drifted: $meanR")
  }

  test("multimodal: real nearest-neighbor resize round-trips through decode") {
    import graft.multimodal.Multimodal
    // 4x4 checkerboard of 2x2 blocks -> resized 2x2 must pick the block
    // corners deterministically (srcX = x*4/2 = 0,2)
    val a = 0x112233; val b = 0xCCBBAA
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4)
      img.setRGB(x, y, if ((x / 2 + y / 2) % 2 == 0) a else b)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray),
      (2L, "junk".getBytes("UTF-8"))).toDF("id", "payload")
    val rs = Multimodal.resizeImage(df, "id", "payload", 2, 2)
    val out = rs.collect().map(r => r.getLong(0) ->
      Option(r.get(1)).map(_.asInstanceOf[Array[Byte]])).toMap
    assert(out(2L).isEmpty, "undecodable payload must resize to null")
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(out(1L).get))
    assert(back.getWidth == 2 && back.getHeight == 2)
    assert((back.getRGB(0, 0) & 0xffffff) == a)
    assert((back.getRGB(1, 0) & 0xffffff) == b)
    assert((back.getRGB(0, 1) & 0xffffff) == b)
    assert((back.getRGB(1, 1) & 0xffffff) == a)
  }

  test("multimodal: luma histogram feature is exact and deterministic") {
    import graft.multimodal.Multimodal
    // half black (luma 0 -> bin 0), half white (luma 255 -> last bin)
    val img = new java.awt.image.BufferedImage(4, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 2; x <- 0 until 4)
      img.setRGB(x, y, if (x < 2) 0x000000 else 0xFFFFFF)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val df = Seq((1L, bos.toByteArray)).toDF("id", "payload")
    val h = Multimodal.imageHistogram(df, "id", "payload", bins = 4)
      .collect().head
    assert(h.decoded)
    assert(h.histogram.get.toSeq == Seq(4L, 0L, 0L, 4L))
  }

  test("multimodal: REAL WAV decode via javax.sound.sampled — exact PCM stats") {
    import graft.multimodal.Multimodal
    // 4 samples of known 16-bit PCM: 100, -200, 32767, -32768
    val samples = Seq(100, -200, 32767, -32768)
    val pcm = samples.flatMap(v =>
      Seq((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)).toArray
    val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    val df = Seq((1L, bos.toByteArray),
      (2L, "not audio".getBytes("UTF-8"))).toDF("id", "payload")
    val st = Multimodal.decodeAudioStats(df, "id", "payload").collect()
      .map(s => s.id -> s).toMap
    assert(st(1L).decoded && st(1L).sample_rate.contains(8000) &&
      st(1L).channels.contains(1) && st(1L).bits.contains(16))
    assert(st(1L).n_frames.contains(4L))
    assert(st(1L).sum_abs.contains(samples.map(v => math.abs(v).toLong).sum))
    assert(st(1L).peak.contains(32768))
    assert(!st(2L).decoded)
  }

  private def buildAvi(frames: Seq[(String, Array[Byte])]): Array[Byte] = {
    def le32(v: Int): Array[Byte] =
      Array[Byte]((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
        ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    val movi = new java.io.ByteArrayOutputStream()
    movi.write("movi".getBytes("US-ASCII"))
    frames.foreach { case (fcc, body) =>
      movi.write(fcc.getBytes("US-ASCII"))
      movi.write(le32(body.length))
      movi.write(body)
      if (body.length % 2 == 1) movi.write(0)
    }
    val m = movi.toByteArray
    val bos = new java.io.ByteArrayOutputStream()
    bos.write("RIFF".getBytes("US-ASCII"))
    bos.write(le32(4 + 8 + m.length))
    bos.write("AVI ".getBytes("US-ASCII"))
    bos.write("LIST".getBytes("US-ASCII"))
    bos.write(le32(m.length))
    bos.write(m)
    bos.toByteArray
  }

  test("multimodal: REAL RIFF/AVI demux — streams, odd-size padding, junk") {
    import graft.multimodal.Multimodal
    val avi = buildAvi(Seq(
      ("00dc", Array[Byte](1, 2, 3)),       // odd size -> padded
      ("01wb", Array[Byte](9, 8, 7, 6)),    // audio stream
      ("00dc", Array[Byte](4, 5)),          // second video frame
      ("ix00", Array[Byte](0, 0))))         // index chunk: not a frame
    val df = Seq((1L, avi), (2L, "not a container".getBytes("UTF-8")))
      .toDF("id", "payload")
    val out = Multimodal.demuxRiffFrames(df, "id", "payload").collect()
    assert(out.forall(_.id == 1L), "junk payload must demux to zero rows")
    val video = out.filter(f => f.stream == "00" && f.kind == "dc")
      .sortBy(_.frame_idx)
    assert(video.length == 2)
    assert(video(0).frame.toSeq == Seq[Byte](1, 2, 3),
      "odd-size frame must exclude the pad byte")
    assert(video(1).frame.toSeq == Seq[Byte](4, 5) && video(1).frame_idx == 1)
    val audio = out.filter(_.kind == "wb")
    assert(audio.length == 1 && audio.head.stream == "01" &&
      audio.head.frame_idx == 0)
  }

  test("multimodal: MJPEG AVI — demuxed frames decode as real JPEGs") {
    import graft.multimodal.Multimodal
    def jpeg(shade: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(8, 6,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 6; x <- 0 until 8)
        img.setRGB(x, y, (shade << 16) | (shade << 8) | shade)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val avi = buildAvi(Seq(("00dc", jpeg(40)), ("00dc", jpeg(200))))
    val df = Seq((1L, avi)).toDF("id", "payload")
    val frames = Multimodal.demuxRiffFrames(df, "id", "payload")
      .map(f => (f.frame_idx.toLong, f.frame)).toDF("id", "frame")
    val stats = Multimodal.decodeImageStats(frames, "id", "frame").collect()
      .map(s => s.id -> s).toMap
    assert(stats.size == 2 && stats.values.forall(_.decoded))
    assert(stats.values.forall(s => s.width.contains(8) && s.height.contains(6)))
    // lossy but monotone: the dark frame must stay darker than the bright one
    assert(stats(0L).sum_r.get < stats(1L).sum_r.get)
  }

  implicit class TupleMapOps[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
