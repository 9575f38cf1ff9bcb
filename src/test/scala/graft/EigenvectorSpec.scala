package graft

import org.apache.spark.sql.functions._

class EigenvectorSpec extends TestBase {
  import spark.implicits._

  private def evMap(g: GraphFrame, threshold: Long, iters: Int = 10): Map[Any, Double] =
    g.eigenvector.maxIter(iters).setSmallGraphThreshold(threshold).run()
      .select("id", "eigenvector").collect()
      .map(r => (r.get(0), r.getDouble(1))).toMap

  test("directed star: the sink holds all mass, spokes decay to 0") {
    // a->z, b->z, c->z: round 1 gives z=3, spokes 0; from round 2 on z has
    // no in-mass either — after an even number of rounds everything is 0
    // EXCEPT... z's in-sum at round 2 is 0, so all-zero → all scores 0.
    val v = Seq("a", "b", "c", "z").toDF("id")
    val e = Seq(("a", "z"), ("b", "z"), ("c", "z")).toDF("src", "dst")
    val m = evMap(GraphFrame(v, e), threshold = 100, iters = 2)
    assert(m.values.forall(_ == 0.0), m.toString)
    // one round: z = 3 (normalized 1.0), spokes 0
    val m1 = evMap(GraphFrame(v, e), threshold = 100, iters = 1)
    assert(m1("z") == 1.0 && m1("a") == 0.0 && m1("b") == 0.0)
  }

  test("directed cycle with a chord: chord target leads, max is exactly 1") {
    // 4-cycle 0->1->2->3->0 plus chord 0->2: vertex 2 has in-degree 2
    val v = (0L to 3L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L), (0L, 2L)).toDF("src", "dst")
    val m = evMap(GraphFrame(v, e), threshold = 100, iters = 12)
    assert(math.abs(m.values.max - 1.0) < 1e-15)
    assert(m(2L) == m.values.max, m.toString)
    assert(m.values.forall(x => x >= 0.0 && x <= 1.0))
  }

  test("isolated vertex scores 0; local tail == distributed supersteps") {
    val v = Seq("a", "b", "c", "iso").toDF("id")
    val e = Seq(("a", "b"), ("b", "c"), ("c", "a"), ("a", "c")).toDF("src", "dst")
    val g = GraphFrame(v, e)
    val local = evMap(g, threshold = 100000)
    val dist = evMap(g, threshold = 0)
    assert(local.keySet == dist.keySet)
    for ((k, x) <- local) assert(math.abs(x - dist(k)) < 1e-9, s"vertex $k")
    assert(local("iso") == 0.0)
  }

  test("parity holds at a deliberately truncated round count too") {
    val v = (0L to 5L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 0L), (2L, 3L), (3L, 4L), (4L, 2L))
      .toDF("src", "dst")
    val g = GraphFrame(v, e)
    for (iters <- Seq(1, 3, 7)) {
      val l = evMap(g, threshold = 100000, iters = iters)
      val d = evMap(g, threshold = 0, iters = iters)
      for ((k, x) <- l) assert(math.abs(x - d(k)) < 1e-12, s"iters $iters vertex $k")
    }
  }

  test("weightCol: weighted in-sums, parity, and bit-identity of w=1 with unweighted") {
    val v = Seq("a", "b", "z", "q").toDF("id")
    val e = Seq(("a", "z", 2.0), ("b", "z", 3.0), ("z", "q", 1.0), ("q", "z", 4.0))
      .toDF("src", "dst", "w")
    val g = GraphFrame(v, e)
    def run(threshold: Long, iters: Int) =
      g.eigenvector.weightCol("w").maxIter(iters)
        .setSmallGraphThreshold(threshold).run()
        .select("id", "eigenvector").collect()
        .map(r => (r.getString(0), r.getDouble(1))).toMap
    // one round: z gets 2+3+4 = 9, q gets 1 → z = 1.0, q = 1/9
    val m1 = run(100000, 1)
    assert(m1("z") == 1.0 && math.abs(m1("q") - 1.0 / 9.0) < 1e-15 && m1("a") == 0.0)
    // local == distributed on the weighted recurrence
    val l = run(100000, 6); val d = run(0, 6)
    for ((k, x) <- l) assert(math.abs(x - d(k)) < 1e-12, s"vertex $k")
    // all-ones weight column is bit-identical to the unweighted operator
    val ones = GraphFrame(v, e.withColumn("w", lit(1.0)))
    val wOne = ones.eigenvector.weightCol("w").maxIter(6).run()
      .select("id", "eigenvector").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    val plain = ones.eigenvector.maxIter(6).run()
      .select("id", "eigenvector").collect().map(r => (r.getString(0), r.getDouble(1))).toMap
    for ((k, x) <- plain) assert(wOne(k) == x, s"vertex $k")
  }

  test("maxIter must be at least 1") {
    val g = GraphFrame(Seq("a").toDF("id"),
      Seq(("a", "a")).toDF("src", "dst"))
    intercept[IllegalArgumentException] { g.eigenvector.maxIter(0) }
  }
}
