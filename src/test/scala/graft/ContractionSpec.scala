package graft

import org.apache.spark.sql.functions._

class ContractionSpec extends TestBase {
  import spark.implicits._

  test("FiniteAXPlusB is invertible-ish: distinct inputs stay distinct") {
    import graft.expressions.FiniteAXPlusB.finiteAxpb
    val df = (0L until 1000L).toDF("x")
      .select(col("x"), finiteAxpb(lit(0x9E3779B97F4A7C15L | 1L), col("x"), lit(12345L)).as("h"))
    assert(df.select("h").distinct().count() == 1000) // a odd => injective map
    // kernel consistency: interpreted == codegen (same value both paths)
    val one = df.filter($"x" === 7L).select("h").as[Long].head()
    assert(one == graft.expressions.FiniteAXPlusB.axpb(0x9E3779B97F4A7C15L | 1L, 7L, 12345L))
  }

  test("randomized contraction CC matches two-phase on every fixture") {
    for (g <- Seq(twoBlobs(3), chain(5), friends, star(4))) {
      val tp = g.connectedComponents.run()
        .select(col("id").cast("string"), col("component")).as[(String, Long)]
        .collect().groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      val rc = g.connectedComponents.setAlgorithm("randomized_contraction").run()
        .select(col("id").cast("string"), col("component")).as[(String, Long)]
        .collect().groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      assert(tp == rc, s"partition mismatch on $g")
    }
  }

  test("randomized contraction: components converging at different rounds stay whole") {
    // Regression: a component that goes edge-free before the final round
    // must not be split into singletons by the backward composition pass.
    // One single edge (contracts in round 1) + a long chain (needs several
    // rounds): reps of the early-finishing component never appear in later
    // rep tables, so the backward join must treat them as roots.
    val chainN = 12L
    val v = ((0L until chainN) ++ Seq(100L, 101L)).toDF("id")
    val e = ((0L until chainN - 1).map(i => (i, i + 1)) :+ ((100L, 101L))).toDF("src", "dst")
    val g = GraphFrame(v, e)
    for (seed <- Seq(1L, 42L, 7L)) {
      val parts = new lib.RandomizedContraction(g).seed(seed).run()
        .select(col("id").cast("long"), col("component")).as[(Long, Long)]
        .collect().groupBy(_._2).values.map(_.map(_._1).toSet).toSet
      assert(parts == Set((0L until chainN).toSet, Set(100L, 101L)),
        s"seed=$seed split a component: $parts")
    }
  }

  test("randomized contraction corner cases ported from RandomizedContractionSuite") {
    // reference RandomizedContractionSuite.scala:15-255 — empty graph,
    // isolated vertex, dangling/disconnected vertices, separate
    // components, extreme ids, directed edges
    def rc(g: GraphFrame) = g.connectedComponents
      .setAlgorithm("randomized_contraction").run()
    // empty graph (:15-26)
    assert(rc(GraphFrame(spark.range(0).toDF("id"),
      Seq.empty[(Long, Long)].toDF("src", "dst"))).count() == 0)
    // single isolated vertex with attrs, empty (filtered) edges (:28-43)
    val iso = rc(GraphFrame(Seq((0L, "a", "b")).toDF("id", "vattr", "gender"),
      Seq((0L, 0L, 1L)).toDF("src", "dst", "test").filter("src > 10")))
    assert(iso.select("id", "component").as[(Long, Long)].collect().toSeq == Seq((0L, 0L)))
    // two connected vertices with edge attrs (:45-62)
    val two = rc(GraphFrame(Seq((0L, "a0"), (1L, "a1")).toDF("id", "A"),
      Seq((0L, 1L, "a01")).toDF("src", "dst", "A")))
      .select("id", "component").as[(Long, Long)].collect()
    assert(two.map(_._2).toSet.size == 1 && two.map(_._1).toSet == Set(0L, 1L))
    // disconnected vertices: every vertex its own component (:79-95)
    val disc = rc(GraphFrame(spark.range(5).toDF("id"),
      Seq.empty[(Long, Long)].toDF("src", "dst")))
    assert(disc.count() == 5 && disc.select("component").distinct().count() == 5)
    // two separate triangles (:97-115)
    val sep = rc(GraphFrame(spark.range(6).toDF("id"),
      Seq((0L, 1L), (1L, 2L), (2L, 0L), (3L, 4L), (4L, 5L), (5L, 3L)).toDF("src", "dst")))
    assert(sep.groupBy("component").count().select("count").as[Long].collect().toSeq
      == Seq(3L, 3L))
    // ids near Long.MinValue survive the GF(2^64) hashing (:214-232)
    val shifted = rc(GraphFrame(
      (0L until 10L).map(_ - Long.MaxValue).toDF("id"),
      (0L until 9L).map(i => (i - Long.MaxValue, i + 1 - Long.MaxValue)).toDF("src", "dst")))
    assert(shifted.count() == 10 && shifted.select("component").distinct().count() == 1)
    // direction is ignored (:234-255)
    val directed = rc(GraphFrame(spark.range(5).toDF("id"),
      Seq((0L, 4L), (4L, 3L), (2L, 3L), (2L, 1L)).toDF("src", "dst")))
    assert(directed.select("component").distinct().count() == 1)
  }

  test("randomized contraction: useLabelsAsComponents relabels by min original id") {
    // reference RandomizedContractionSuite.scala:137-175 — string and
    // long ids; component label = minimum ORIGINAL id, in the id's type
    val sg = GraphFrame(Seq("a", "b", "c", "d").toDF("id"),
      Seq(("a", "b"), ("b", "c")).toDF("src", "dst"))
    val sc = sg.connectedComponents.setAlgorithm("randomized_contraction")
      .setUseLabelsAsComponents(true).run()
    assert(sc.count() == 4)
    assert(sc.select("component").as[String].collect().toSet == Set("a", "d"))
    val lg = GraphFrame(Seq(1L, 2L, 3L, 4L).toDF("id"),
      Seq((1L, 2L), (2L, 3L)).toDF("src", "dst"))
    val lc = lg.connectedComponents.setAlgorithm("randomized_contraction")
      .setUseLabelsAsComponents(true).run()
    assert(lc.select("component").as[Long].collect().toSet == Set(1L, 4L))
  }

  test("randomized contraction leaves no persisted state behind") {
    // reference RandomizedContractionSuite.scala:195-212. Compare the SET
    // of persisted RDD ids, not counts: other suites' finish()-cut results
    // are reclaimed asynchronously by the ContextCleaner, so absolute
    // counts race when the whole suite runs together.
    val before = spark.sparkContext.getPersistentRDDs.keySet
    val out = chain(10).connectedComponents
      .setAlgorithm("randomized_contraction").run()
    assert(out.count() == 10)
    GraphFrame.release(out)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  test("hash embeddings: deterministic, normalized width") {
    val pairs = Seq(("a", "x"), ("a", "y"), ("b", "x")).toDF("item", "context")
    val e1 = embeddings.HashEmbeddings.fromPairs(pairs, "item", "context", dim = 8)
    val m = e1.select("id", "embedding").as[(String, Seq[Double])].collect().toMap
    assert(m.size == 2 && m("a").length == 8)
    // b has one context: each lane is ±1/sqrt(1)
    assert(m("b").forall(v => math.abs(math.abs(v) - 1.0) < 1e-12))
    val e2 = embeddings.HashEmbeddings.fromPairs(pairs, "item", "context", dim = 8)
    assert(rows(e1) == rows(e2))
  }

  test("graph hash embeddings cover walked vertices") {
    val emb = embeddings.HashEmbeddings.forGraph(twoBlobs(3), dim = 4, walkLength = 3)
    assert(emb.count() == 6)
    assert(emb.select(size($"embedding")).as[Int].collect().forall(_ == 4))
  }
}
