package graft

import org.apache.spark.sql.functions._

/** SALSA: walk-normalized HITS — hand-computed stationary shapes and
 * driver-tail vs distributed parity. */
class SalsaSpec extends TestBase {
  import spark.implicits._

  test("star: the hub holds all hub mass; leaves split authority evenly") {
    val g = star(3) // 0 -> 1,2,3
    val r = g.salsa.maxIter(4).run().collect()
      .map(x => x.getLong(0) -> (x.getAs[Double]("hub"), x.getAs[Double]("authority"))).toMap
    assert(r(0L) == ((1.0, 0.0)))
    Seq(1L, 2L, 3L).foreach { v =>
      assert(math.abs(r(v)._2 - 1.0 / 3) < 1e-15 && r(v)._1 == 0.0)
    }
  }

  test("normalization tames the fan-out hub raw HITS rewards") {
    // vertex 9 links to 5 targets, vertex 8 links to 1 exclusive target;
    // SALSA's 1/outdeg split keeps 8 a real hub, HITS drowns it
    val v = (0L to 9L).toDF("id")
    val e = ((1L to 5L).map(t => (9L, t)) :+ (8L, 7L)).toDF("src", "dst")
    val g = GraphFrame(v, e)
    val salsa = g.salsa.maxIter(3).run().collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("hub")).toMap
    // each walk returns all mass to its origin: hubs stay proportional
    // to their start mass (1 each) -> equal after L1
    assert(math.abs(salsa(9L) - salsa(8L)) < 1e-15)
    val hits = g.hits.maxIter(3).run().collect()
      .map(x => x.getLong(0) -> x.getAs[Double]("hub")).toMap
    assert(hits(9L) > 5 * hits(8L)) // raw sums reward fan-out
  }

  test("driver tail and forced distributed agree") {
    val g = GraphFrame(
      (0L to 6L).toDF("id"),
      Seq((0L, 1L), (0L, 2L), (1L, 2L), (2L, 3L), (3L, 0L), (4L, 2L),
        (4L, 5L)).toDF("src", "dst"))
    val tail = g.salsa.maxIter(4).run().collect()
      .map(x => (x.getLong(0), x.getAs[Double]("hub"), x.getAs[Double]("authority")))
      .sortBy(_._1)
    val dist = g.salsa.maxIter(4).setSmallGraphThreshold(0).run().collect()
      .map(x => (x.getLong(0), x.getAs[Double]("hub"), x.getAs[Double]("authority")))
      .sortBy(_._1)
    tail.zip(dist).foreach { case ((i, h1, a1), (j, h2, a2)) =>
      assert(i == j && math.abs(h1 - h2) < 1e-12 && math.abs(a1 - a2) < 1e-12)
    }
    // isolated vertex 6 scores 0 on both
    assert(tail.find(_._1 == 6L).get._2 == 0.0)
  }
}
