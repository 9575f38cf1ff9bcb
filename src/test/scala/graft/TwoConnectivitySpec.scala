package graft

import org.apache.spark.sql.functions._

/** 2-connectivity: the driver-tail Tarjan and the distributed BFS-forest
 * path must BOTH match a brute-force removal oracle (bridge = removal
 * disconnects its endpoints; articulation = removal raises the component
 * count), including the cross-edge cases a naive DFS-lowpoint-on-BFS-tree
 * port gets wrong. */
class TwoConnectivitySpec extends TestBase {
  import spark.implicits._

  private def gf(n: Int, es: Seq[(Long, Long)]): GraphFrame =
    GraphFrame((0L until n.toLong).toDF("id"), es.toDF("src", "dst"))

  // ---- brute-force removal oracle over the simple undirected graph ----
  private def comps(vs: Set[Long], es: Set[(Long, Long)]): Int = {
    val adj = es.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var seen = Set.empty[Long]; var c = 0
    vs.foreach { v =>
      if (!seen(v)) {
        c += 1
        var frontier = List(v); seen += v
        while (frontier.nonEmpty) {
          val nxt = frontier.flatMap(x => adj.getOrElse(x, Nil))
            .filter(vs).filterNot(seen)
          seen ++= nxt; frontier = nxt
        }
      }
    }
    c
  }
  private def canon(es: Seq[(Long, Long)]): Set[(Long, Long)] =
    es.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet

  private def bruteBridges(n: Int, es: Seq[(Long, Long)]): Map[(Long, Long), Boolean] = {
    val vs = (0L until n.toLong).toSet; val ce = canon(es)
    ce.map(e => e -> (comps(vs, ce - e) > comps(vs, ce))).toMap
  }
  private def bruteArt(n: Int, es: Seq[(Long, Long)]): Map[Long, Boolean] = {
    val vs = (0L until n.toLong).toSet; val ce = canon(es)
    val base = comps(vs, ce)
    vs.map { v =>
      val deg = ce.count(e => e._1 == v || e._2 == v)
      val after = comps(vs - v, ce.filter(e => e._1 != v && e._2 != v))
      v -> (deg >= 1 && after > base)
    }.toMap
  }
  private def brute2ecc(n: Int, es: Seq[(Long, Long)]): Map[Long, Long] = {
    val vs = (0L until n.toLong).toSet; val ce = canon(es)
    val br = bruteBridges(n, es).filter(_._2).keySet
    val keep = ce -- br
    vs.map { v =>
      // min reachable id over non-bridge edges
      var seen = Set(v); var frontier = List(v)
      while (frontier.nonEmpty) {
        val nxt = frontier.flatMap(x =>
          keep.collect { case (a, b) if a == x => b; case (a, b) if b == x => a })
          .filterNot(seen)
        seen ++= nxt; frontier = nxt
      }
      v -> seen.min
    }.toMap
  }

  private def checkAll(n: Int, es: Seq[(Long, Long)], label: String): Unit = {
    for (thr <- Seq(100000L, 0L)) { // driver tail AND forced distributed
      val tc = gf(n, es).twoConnectivity.setSmallGraphThreshold(thr)
      val gotB = tc.bridges().collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getBoolean(2)).toMap
      assert(gotB == bruteBridges(n, es), s"$label bridges thr=$thr")
      val gotA = gf(n, es).twoConnectivity.setSmallGraphThreshold(thr)
        .articulationPoints().collect()
        .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
      assert(gotA == bruteArt(n, es), s"$label articulation thr=$thr")
      val gotC = gf(n, es).twoConnectivity.setSmallGraphThreshold(thr)
        .twoEdgeComponents().collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(gotC == brute2ecc(n, es), s"$label 2ecc thr=$thr")
    }
  }

  test("path graph: every edge a bridge, inner vertices articulation, singleton 2eccs") {
    checkAll(4, Seq((0L, 1L), (1L, 2L), (2L, 3L)), "path")
  }

  test("cycle: no bridges, no articulation, one 2ecc") {
    checkAll(5, (0L to 4L).map(i => (i, (i + 1) % 5)), "cycle")
  }

  test("barbell: the connecting edge is the only bridge; its endpoints cut") {
    // triangles {0,1,2} and {3,4,5} joined by 2-3
    checkAll(6, Seq((0L, 1L), (1L, 2L), (0L, 2L), (3L, 4L), (4L, 5L), (3L, 5L), (2L, 3L)),
      "barbell")
  }

  test("sibling cross edge at the root: grouped children rescue the root") {
    // 0-1, 0-2, 1-3, 2-4, 3-4: removing 0 leaves 1-3-4-2 connected — the
    // cross edge joins the two child subtrees WITHOUT escaping above 0;
    // a per-child escape rule would wrongly flag the root
    checkAll(5, Seq((0L, 1L), (0L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), "root-cross")
  }

  test("sibling cross edge below a real articulation point") {
    // 0-1, 1-2, 1-3, 2-4, 3-4: the {2,3,4} group is trapped under 1
    checkAll(5, Seq((0L, 1L), (1L, 2L), (1L, 3L), (2L, 4L), (3L, 4L)), "trapped-group")
  }

  test("disconnected graph with isolated vertex and a duplicate directed pair") {
    // component {0,1,2} path + component {3,4} + isolated 5; 1⇄2 collapses
    checkAll(6, Seq((0L, 1L), (1L, 2L), (2L, 1L), (3L, 4L)), "multi-comp")
  }

  test("pseudo-random graphs: both paths match the removal oracle") {
    for (seed <- 1 to 4) {
      val es = for {
        a <- 0L until 10L; b <- (a + 1) until 10L
        if (a * 31 + b * 17 + seed * 13) % 7 < 2
      } yield (a, b)
      checkAll(10, es, s"rand-$seed")
    }
  }
}
