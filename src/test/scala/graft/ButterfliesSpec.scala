package graft

import org.apache.spark.sql.functions._

/** Butterfly counting: the pair-overlap identity B = Σ C(c,2) is checked
 * against brute-force 4-cycle enumeration on deterministic pseudo-random
 * bipartite graphs, plus closed-form bicliques and the pivot cap. */
class ButterfliesSpec extends TestBase {
  import spark.implicits._
  import graft.lib.Butterflies

  /** Brute force: count {l1<l2} x {r1<r2} with all four edges present. */
  private def brute(edges: Set[(Int, Int)]): Long = {
    val ls = edges.map(_._1).toSeq.sorted
    val rs = edges.map(_._2).toSeq.sorted
    var b = 0L
    for {
      i <- ls.indices; j <- i + 1 until ls.size
      x <- rs.indices; y <- x + 1 until rs.size
      if edges((ls(i), rs(x))) && edges((ls(i), rs(y))) &&
        edges((ls(j), rs(x))) && edges((ls(j), rs(y)))
    } b += 1
    b
  }

  private def bruteVertex(edges: Set[(Int, Int)]): Map[Int, Long] = {
    val ls = edges.map(_._1).toSeq.sorted
    val rs = edges.map(_._2).toSeq.sorted
    val m = scala.collection.mutable.Map.empty[Int, Long].withDefaultValue(0L)
    for {
      i <- ls.indices; j <- i + 1 until ls.size
      x <- rs.indices; y <- x + 1 until rs.size
      if edges((ls(i), rs(x))) && edges((ls(i), rs(y))) &&
        edges((ls(j), rs(x))) && edges((ls(j), rs(y)))
    } { m(ls(i)) += 1; m(ls(j)) += 1 }
    ls.map(l => l -> m(l)).toMap
  }

  /** Deterministic pseudo-random edge set (md5-free: linear congruence). */
  private def pseudoEdges(nl: Int, nr: Int, seed: Int): Set[(Int, Int)] =
    (for (l <- 0 until nl; r <- 0 until nr
      if (l * 31 + r * 17 + seed * 7) % 3 == 0) yield (l, r)).toSet

  test("complete K(3,3) biclique has C(3,2)^2 = 9 butterflies") {
    val e = (for (l <- 0 until 3; r <- 0 until 3) yield (l, r + 100))
      .toDF("l", "r")
    val row = Butterflies.globalCounts(e, "l", "r").head()
    assert(row.getAs[Long]("n_butterflies") == 9L)
    // wedges: 3 pairs of left vertices, each sharing 3 rights
    assert(row.getAs[Long]("n_wedges") == 9L)
    assert(row.getAs[Long]("max_copair") == 3L)
  }

  test("pair identity matches brute-force 4-cycle enumeration on pseudo-random graphs") {
    for (seed <- 1 to 3) {
      val es = pseudoEdges(7, 6, seed)
      val df = es.toSeq.toDF("l", "r")
      val got = Butterflies.globalCounts(df, "l", "r").head().getAs[Long]("n_butterflies")
      assert(got == brute(es), s"seed $seed")
      val per = Butterflies.perVertex(df, "l", "r").collect()
        .map(r => r.getAs[Int]("id") -> r.getAs[Long]("butterflies")).toMap
      assert(per == bruteVertex(es), s"seed $seed per-vertex")
    }
  }

  test("duplicate edge rows do not change counts; sum of supports is 2B") {
    val es = pseudoEdges(6, 5, 4)
    val dup = (es.toSeq ++ es.toSeq.take(5)).toDF("l", "r")
    val b = Butterflies.globalCounts(dup, "l", "r").head().getAs[Long]("n_butterflies")
    assert(b == brute(es))
    val sum = Butterflies.perVertex(dup, "l", "r")
      .agg(org.apache.spark.sql.functions.sum("butterflies")).head().getLong(0)
    assert(sum == 2 * b)
  }

  test("maxPivotDegree excludes hub pivots (lower bound), keeps the rest exact") {
    // hub right vertex 0 touches every left; flat pivot 1 touches two
    val e = ((0 until 5).map(l => (l, 0)) ++ Seq((0, 1), (1, 1))).toDF("l", "r")
    val full = Butterflies.globalCounts(e, "l", "r").head().getAs[Long]("n_butterflies")
    // pair (0,1) shares pivots {0,1}: C(2,2)=1 butterfly; others share only hub 0
    assert(full == 1L)
    val capped = Butterflies.globalCounts(e, "l", "r", maxPivotDegree = 3)
      .head().getAs[Long]("n_butterflies")
    assert(capped == 0L) // hub removed -> the butterfly's pivot pair is gone
  }
}
