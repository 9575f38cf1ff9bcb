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
