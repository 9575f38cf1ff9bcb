package graft

import org.apache.spark.sql.functions._

class WeightedPageRankSpec extends TestBase {
  import spark.implicits._

  private def g2(w01: java.lang.Double, w02: java.lang.Double): GraphFrame = {
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L, w01), (0L, 2L, w02)).toDF("src", "dst", "w")
    GraphFrame(v, e)
  }

  private def ranks(g: GraphFrame, wc: Option[String], iters: Int): Map[Long, Double] = {
    val pr = g.pageRank.resetProbability(0.15).maxIter(iters)
    wc.foreach(pr.weightCol)
    pr.run().vertices.select("id", "pagerank")
      .as[(Long, Double)].collect().toMap
  }

  test("one iteration distributes mass proportionally to the weights") {
    val m = ranks(g2(3.0, 1.0), Some("w"), 1)
    assert(math.abs(m(1L) - (0.15 + 0.85 * 0.75)) < 1e-12)
    assert(math.abs(m(2L) - (0.15 + 0.85 * 0.25)) < 1e-12)
    assert(math.abs(m(0L) - 0.15) < 1e-12)
  }

  test("uniform weights reproduce the unweighted ranks exactly") {
    val w = ranks(g2(1.0, 1.0), Some("w"), 5)
    val u = ranks(g2(1.0, 1.0), None, 5)
    for ((k, v) <- u) assert(math.abs(v - w(k)) < 1e-12, s"vertex $k")
  }

  test("zero-weight edges carry no mass; weight output column normalizes") {
    val m = ranks(g2(0.0, 2.0), Some("w"), 1)
    assert(math.abs(m(1L) - 0.15) < 1e-12)
    assert(math.abs(m(2L) - (0.15 + 0.85)) < 1e-12)
    val wts = g2(0.0, 2.0).pageRank.weightCol("w").maxIter(1).run()
      .edges.select("dst", "weight").as[(Long, Double)].collect().toMap
    assert(wts == Map(1L -> 0.0, 2L -> 1.0))
  }

  test("null and negative weights fail eagerly") {
    intercept[IllegalArgumentException](ranks(g2(null, 1.0), Some("w"), 1))
    intercept[IllegalArgumentException](ranks(g2(-1.0, 1.0), Some("w"), 1))
  }
}
