package graft

import org.apache.spark.sql.functions._

class MinimumSpanningForestSpec extends TestBase {
  import spark.implicits._

  private def msf(g: GraphFrame, threshold: Long): Set[(Any, Any, Double)] =
    g.minimumSpanningForest.weightCol("w").setSmallGraphThreshold(threshold)
      .run().collect().map(r => (r.get(0), r.get(1), r.getDouble(2))).toSet

  test("triangle: the two cheapest edges win") {
    val v = Seq(1L, 2L, 3L).toDF("id")
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 5.0)).toDF("src", "dst", "w")
    val got = msf(GraphFrame(v, e), threshold = 100)
    assert(got == Set((1L, 2L, 1.0), (2L, 3L, 2.0)))
  }

  test("weight ties broken by (a, b): deterministic forest on an all-equal square") {
    // 4-cycle, every weight 1.0 — keys (1,1,2) < (1,1,4) < (1,2,3) < (1,3,4):
    // cycle rule drops the LAST key (3,4), keeping the first three
    val v = Seq(1L, 2L, 3L, 4L).toDF("id")
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 1.0), (3L, 4L, 1.0), (4L, 1L, 1.0))
      .toDF("src", "dst", "w")
    val got = msf(GraphFrame(v, e), threshold = 100)
    assert(got == Set((1L, 2L, 1.0), (1L, 4L, 1.0), (2L, 3L, 1.0)))
  }

  test("parallel + antiparallel edges collapse to the cheapest; self-loops and null weights drop") {
    val v = Seq("a", "b", "c").toDF("id")
    val e = Seq(("a", "b", java.lang.Double.valueOf(9.0)),
        ("b", "a", java.lang.Double.valueOf(2.0)), // antiparallel, cheaper
        ("a", "b", java.lang.Double.valueOf(4.0)),
        ("b", "c", java.lang.Double.valueOf(3.0)),
        ("c", "c", java.lang.Double.valueOf(0.1)), // self-loop
        ("a", "c", null.asInstanceOf[java.lang.Double])) // null weight
      .toDF("src", "dst", "w")
    val got = msf(GraphFrame(v, e), threshold = 100)
    assert(got == Set(("a", "b", 2.0), ("b", "c", 3.0)))
  }

  test("disconnected graph yields a forest, one tree per component") {
    val v = (1L to 6L).toDF("id")
    val e = Seq((1L, 2L, 1.0), (2L, 3L, 2.0), (1L, 3L, 3.0),
      (4L, 5L, 1.0), (5L, 6L, 1.0), (4L, 6L, 9.0)).toDF("src", "dst", "w")
    val got = msf(GraphFrame(v, e), threshold = 100)
    assert(got.size == 4)
    assert(got == Set((1L, 2L, 1.0), (2L, 3L, 2.0), (4L, 5L, 1.0), (5L, 6L, 1.0)))
  }

  test("empty edge set returns an empty frame with the contract schema") {
    val g = GraphFrame(Seq(1L, 2L).toDF("id"),
      Seq.empty[(Long, Long, Double)].toDF("src", "dst", "w"))
    val out = g.minimumSpanningForest.weightCol("w").run()
    assert(out.columns.toSeq == Seq("src", "dst", "weight"))
    assert(out.isEmpty)
    // distributed path too
    val outD = g.minimumSpanningForest.weightCol("w")
      .setSmallGraphThreshold(0).run()
    assert(outD.isEmpty)
  }

  /** xorshift-ish deterministic weighted edges: no RNG state in the suite. */
  private def randomWeighted(seed: Long, n: Int, m: Int): GraphFrame = {
    var x = seed
    def next(): Long = { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; math.abs(x) }
    val edges = (1 to m).map(_ =>
      (next() % n, next() % n, (next() % 7).toDouble)) // few weight levels → ties
    val v = (0L until n.toLong).toDF("id")
    GraphFrame(v, edges.toDF("src", "dst", "w"))
  }

  test("Kruskal tail == distributed Borůvka on random weighted graphs (uniqueness theorem)") {
    for ((seed, n, m) <- Seq((0xA5F3L, 9, 14), (0x1234L, 14, 30), (0xBEEFL, 8, 8),
        (0xD00DL, 20, 55))) {
      val g = randomWeighted(seed, n, m)
      val local = msf(g, threshold = 100000)
      val dist = msf(g, threshold = 0)
      assert(local == dist, s"seed $seed: local $local vs distributed $dist")
      // forest invariant: |F| = V_touched − C (verified via the engine's own CC)
      val touched = g.edges.filter(col("src") =!= col("dst"))
        .select(col("src").as("id")).union(g.edges.select(col("dst")))
        .filter(col("id").isNotNull).distinct().count()
      val comps = GraphFrame(g.vertices, g.edges.filter(col("src") =!= col("dst")))
        .dropIsolatedVertices.connectedComponents.run()
        .select("component").distinct().count()
      assert(local.size == touched - comps, s"seed $seed: tree-count invariant")
    }
  }

  test("weightCol is required") {
    val g = GraphFrame(Seq(1L).toDF("id"), Seq((1L, 1L, 1.0)).toDF("src", "dst", "w"))
    intercept[IllegalArgumentException] { g.minimumSpanningForest.run() }
  }
}
