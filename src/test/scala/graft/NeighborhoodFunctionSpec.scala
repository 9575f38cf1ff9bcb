package graft

import org.apache.spark.sql.functions._

class NeighborhoodFunctionSpec extends TestBase {
  import spark.implicits._

  private def nf(g: GraphFrame): Map[Int, Long] =
    g.neighborhoodFunction.run().as[(Int, Long)].collect().toMap

  test("directed chain: N(d) grows by the remaining suffix sizes") {
    // 0->1->2->3: N(0)=4, N(1)=7, N(2)=9, N(3)=10, then saturates
    assert(nf(chain(4)) == Map(0 -> 4L, 1 -> 7L, 2 -> 9L, 3 -> 10L))
  }

  test("star saturates at distance 1; leaves reach nothing") {
    assert(nf(star(3)) == Map(0 -> 4L, 1 -> 7L))
  }

  test("friends graph matches brute-force BFS pair counts per distance") {
    val edges = friends.edges.select("src", "dst").as[(String, String)]
      .collect().toSeq
    val ids = friends.vertices.select("id").as[String].collect().toSeq
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    // brute-force N(d): BFS from every vertex
    val dists = for (s <- ids) yield {
      val dist = scala.collection.mutable.HashMap(s -> 0)
      val q = scala.collection.mutable.Queue(s)
      while (q.nonEmpty) {
        val v = q.dequeue()
        for (w <- adj.getOrElse(v, Nil) if !dist.contains(w)) {
          dist(w) = dist(v) + 1; q.enqueue(w)
        }
      }
      dist.values.toSeq
    }
    val flat = dists.flatten
    val maxd = flat.max
    val expected = (0 to maxd).map(d => d -> flat.count(_ <= d).toLong).toMap
    assert(nf(friends) == expected)
  }

  test("effective diameter: chain alpha interpolation points") {
    // N = (4, 7, 9, 10); N(max)=10: alpha 0.9 -> first d with N >= 9 is 2
    assert(chain(4).neighborhoodFunction.effectiveDiameter(0.9) == 2.0)
    assert(chain(4).neighborhoodFunction.effectiveDiameter(1.0) == 3.0)
    assert(chain(4).neighborhoodFunction.effectiveDiameter(0.4) == 0.0)
  }

  test("maxIter caps the expansion depth") {
    val m = chain(6).neighborhoodFunction.maxIter(2).run()
      .as[(Int, Long)].collect().toMap
    assert(m.keySet == Set(0, 1, 2))
  }

  test("invalid parameters rejected") {
    intercept[IllegalArgumentException](
      chain(3).neighborhoodFunction.setLgNomEntries(30))
    intercept[IllegalArgumentException](
      chain(3).neighborhoodFunction.effectiveDiameter(0.0))
  }

  test("interpolated effective diameter on the 5-chain, hand-computed") {
    // directed chain 0->..->4: N(0)=5, N(1)=9, N(2)=12, N(3)=14, N(4)=15
    // thr = 13.5 -> d0 = 3, eff = 2 + (13.5-12)/(14-12) = 2.75
    val r = chain(5).neighborhoodFunction.effectiveDiameterReport(0.9).head()
    assert(math.abs(r.getAs[Double]("effective_diameter") - 2.75) < 1e-12)
    assert(r.getAs[Int]("effective_diameter_int") == 3)
    assert(r.getAs[Int]("diameter") == 4)
    assert(r.getAs[Long]("n_pairs_total") == 15L)
  }

  test("edgeless graph: interpolated readout clamps at 0, never negative") {
    // d=0 already satisfies N(0) >= alpha*N(inf); the raw interpolation
    // formula would yield (0-1) + alpha = -0.1 — the classic ANF readout
    // floors at 0
    val v = Seq("a", "b", "c").toDF("id")
    val e = Seq.empty[(String, String)].toDF("src", "dst")
    val r = GraphFrame(v, e).neighborhoodFunction
      .effectiveDiameterReport(0.9).head()
    assert(r.getAs[Double]("effective_diameter") == 0.0)
    assert(r.getAs[Int]("effective_diameter_int") == 0)
  }

  test("precomputed-nf overload matches the self-running readout") {
    val anf = chain(5).neighborhoodFunction
    val nfTable = anf.run()
    val a = anf.effectiveDiameterReport(0.9).head()
    val b = anf.effectiveDiameterReport(nfTable, 0.9).head()
    assert(a == b)
  }
}
