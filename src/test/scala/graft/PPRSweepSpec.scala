package graft

import org.apache.spark.sql.functions._

/** PPR sweep-cut local community detection: the two-clique bridge fixture
 * must recover the seed's clique as the argmin-conductance prefix, and
 * every sweep row's integer cut/vol must equal a brute-force recount. */
class PPRSweepSpec extends TestBase {
  import spark.implicits._

  // K4 {1,2,3,4} + K4 {5,6,7,8} joined by the single bridge 4–5
  private def twoCliques: GraphFrame = {
    val v = (1L to 8L).toDF("id")
    val k = (base: Long) =>
      for (a <- base to base + 3; b <- base to base + 3 if a < b) yield (a, b)
    val e = (k(1L) ++ k(5L) :+ (4L, 5L)).toDF("src", "dst")
    GraphFrame(v, e)
  }

  test("seed in clique A finds exactly clique A at the conductance argmin") {
    val sweep = twoCliques.pprSweep.source(1L).maxIter(10).sweepK(8).run()
      .orderBy("rank").collect()
    val bestRanks = sweep.filter(_.getAs[Boolean]("best")).map(_.getAs[Int]("rank"))
    assert(bestRanks.toSeq == Seq(4), s"best at ${bestRanks.toSeq}")
    val community = sweep.take(4).map(_.getAs[Long]("id")).toSet
    assert(community == Set(1L, 2L, 3L, 4L))
    // hand counts: vol(A) = 3+3+3+4 = 13, cut(A) = 1 (the bridge),
    // m = 13 → φ = 1/13
    val bestRow = sweep(3)
    assert(bestRow.getAs[Long]("vol") == 13L && bestRow.getAs[Long]("cut") == 1L)
    assert(math.abs(bestRow.getAs[Double]("conductance") - 1.0 / 13.0) < 1e-12)
  }

  test("every sweep row's cut and vol match a brute-force recount") {
    val g = twoCliques
    val sweep = g.pprSweep.source(2L).maxIter(8).sweepK(8).run()
      .orderBy("rank").collect()
    val edges = g.edges.as[(Long, Long)].collect()
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
    val deg = edges.flatMap(e => Seq(e._1, e._2)).groupBy(identity).view
      .mapValues(_.length.toLong).toMap
    var prefix = Set.empty[Long]
    sweep.foreach { r =>
      prefix += r.getAs[Long]("id")
      val vol = prefix.toSeq.map(deg).sum
      val cut = edges.count(e => prefix(e._1) != prefix(e._2)).toLong
      assert(r.getAs[Long]("vol") == vol, s"rank ${r.getAs[Int]("rank")} vol")
      assert(r.getAs[Long]("cut") == cut, s"rank ${r.getAs[Int]("rank")} cut")
      val den = math.min(vol, 2L * edges.length - vol)
      if (den > 0)
        assert(math.abs(r.getAs[Double]("conductance") - cut.toDouble / den) < 1e-12)
      else assert(r.isNullAt(r.fieldIndex("conductance")))
    }
  }

  test("whole-graph prefix has null conductance (denominator 0), never best") {
    // path graph a-b: sweeping both vertices reaches vol = 2m
    val g = GraphFrame(Seq(1L, 2L).toDF("id"), Seq((1L, 2L)).toDF("src", "dst"))
    val rows = g.pprSweep.source(1L).maxIter(5).sweepK(5).run()
      .orderBy("rank").collect()
    assert(rows.length == 2)
    assert(rows(1).isNullAt(rows(1).fieldIndex("conductance")))
    assert(!rows(1).getAs[Boolean]("best") && rows(0).getAs[Boolean]("best"))
  }

  test("isolated seed yields an empty sweep; guards validate") {
    val g = GraphFrame(Seq(1L, 2L, 3L).toDF("id"),
      Seq((2L, 3L)).toDF("src", "dst"))
    // seed 1 touches no edge: its ppr never reaches a ranked (degree>0)
    // vertex — the sweep from it contains no vertex of its component
    val rows = g.pprSweep.source(1L).maxIter(5).sweepK(5).run().collect()
    assert(!rows.exists(_.getAs[Long]("id") == 1L))
    intercept[IllegalArgumentException] { g.pprSweep.run() }
    intercept[IllegalArgumentException] { g.pprSweep.source(1L).sweepK(0) }
    intercept[IllegalArgumentException] { g.pprSweep.source(1L).resetProbability(1.5) }
  }
}
