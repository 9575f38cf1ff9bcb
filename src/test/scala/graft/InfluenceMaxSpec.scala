package graft

import org.apache.spark.sql.functions._

/** Degree-discount influence maximization: hand-checked picks plus a
 * local greedy replay on pseudo-random graphs. */
class InfluenceMaxSpec extends TestBase {
  import spark.implicits._

  test("star: hub first, then the smallest fully-discounted leaf") {
    val g = star(4)
    val single = g.influenceMax.k(2).mode("single").run().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(single.toSeq == Seq((0L, 1, 4.0), (1L, 2, 0.0)))
    val dd = g.influenceMax.k(2).mode("degree").p(0.1).run().collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    assert(dd.toSeq == Seq((0L, 1, 4.0), (1L, 2, -1.0)))
  }

  test("matches a local greedy replay on pseudo-random graphs") {
    for (seed <- 1 to 2) {
      val es = for {
        a <- 0L until 9L; b <- (a + 1) until 9L
        if (a * 29 + b * 13 + seed * 7) % 5 < 2
      } yield (a, b)
      val g = GraphFrame((0L until 9L).toDF("id"), es.toDF("src", "dst"))
      val got = g.influenceMax.k(4).mode("degree").p(0.25).run().collect()
        .map(r => (r.getLong(0), r.getInt(1))).toSeq
      // local replay with identical scoring and tie rule
      val adj = es.flatMap { case (a, b) => Seq(a -> b, b -> a) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val d = (0L until 9L).map(v => v -> adj.getOrElse(v, Set.empty).size.toLong).toMap
      val t = scala.collection.mutable.Map((0L until 9L).map(_ -> 0L): _*)
      val picked = scala.collection.mutable.Set.empty[Long]
      val expect = (1 to 4).map { r =>
        val cand = (0L until 9L).filterNot(picked)
          .map(v => (v, d(v) - 2 * t(v) - (d(v) - t(v)) * t(v) * 0.25))
        val best = cand.minBy { case (v, s) => (-s, v) }._1
        picked += best
        adj.getOrElse(best, Set.empty).foreach(n => t(n) += 1)
        (best, r)
      }
      assert(got == expect, s"seed $seed: $got vs $expect")
    }
  }

  test("k larger than the vertex count stops after everyone is picked") {
    val g = chain(3)
    val got = g.influenceMax.k(10).mode("single").run().collect()
    assert(got.length == 3 && got.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
  }
}
