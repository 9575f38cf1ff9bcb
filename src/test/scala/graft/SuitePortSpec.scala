package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.lib.AggregateNeighbors

/** Cases ported from the reference's KCoreSuite / MaximalIndependentSetSuite /
 * DetectingCyclesSuite / AggregateNeighborsSuite / ShortestPathsSuite —
 * fixture shapes and expected values follow the reference files cited per
 * test; assertions adapt to this engine's output contracts (e.g. cycles
 * print without the closing repeat). */
class SuitePortSpec extends TestBase {
  import spark.implicits._

  // ---------------- KCore (reference KCoreSuite.scala:59-283) ----------------

  test("kCore: star graph pulls the center down to 1") {
    val g = star(3)
    val m = g.kCore.run().as[(Long, Int)].collect().toMap
    assert(m.values.toSet == Set(1)) // degree-3 center, but no 2-core can form
  }

  test("kCore: medium graph with varying k-core values (reference fixture)") {
    val v = (0L until 25L).toDF("id")
    val e = Seq(
      (0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L), (0L, 5L),
      (1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L),
      (1L, 6L), (2L, 7L), (3L, 8L), (4L, 9L), (5L, 10L),
      (11L, 12L), (11L, 13L), (11L, 14L), (12L, 13L), (12L, 15L),
      (13L, 14L), (13L, 16L), (14L, 17L),
      (18L, 19L), (19L, 20L), (20L, 21L), (21L, 22L),
      (6L, 12L), (7L, 13L), (8L, 14L), (9L, 15L), (10L, 16L),
      (23L, 24L)).toDF("src", "dst")
    val m = GraphFrame(v, e).kCore.run().as[(Long, Int)].collect().toMap
    assert(m.size == 25)
    assert(m.values.toSet.size >= 3, "at least 3 distinct k-core values")
    assert(m(0L) >= 3 && m(1L) >= 3, "dense-cluster vertices carry high core")
    assert(m(18L) <= 2 && m(23L) <= 1, "chain/leaf vertices carry low core")
  }

  test("kCore: hierarchical core/mid/outer layers (reference fixture)") {
    val core = for { i <- 0 until 5; j <- (i + 1) until 5 } yield (i.toLong, j.toLong)
    val mid = Seq(
      (5L, 0L), (5L, 1L), (5L, 2L), (6L, 0L), (6L, 1L), (6L, 3L),
      (7L, 1L), (7L, 2L), (7L, 4L), (8L, 0L), (8L, 3L), (8L, 4L),
      (9L, 1L), (9L, 2L), (9L, 3L), (10L, 0L), (10L, 4L),
      (11L, 2L), (11L, 3L), (12L, 1L), (12L, 4L), (13L, 0L), (13L, 2L),
      (14L, 3L), (14L, 4L))
    val outer = (15L to 24L).map(i => (i, i - 10L)) ++ (25L to 29L).map(i => (i, i - 10L))
    val v = (0L until 30L).toDF("id")
    val e = (core ++ mid ++ outer).toDF("src", "dst")
    val m = GraphFrame(v, e).kCore.run().as[(Long, Int)].collect().toMap
    (0L to 4L).foreach(i => assert(m(i) >= 4, s"core vertex $i: ${m(i)}"))
    (5L to 9L).foreach(i => assert(m(i) >= 2, s"mid vertex $i: ${m(i)}"))
    (15L to 29L).foreach(i => assert(m(i) == 1, s"outer vertex $i: ${m(i)}"))
  }

  // ------------- MIS (reference MaximalIndependentSetSuite.scala:9-121) -------------

  private def isIndependent(g: GraphFrame, mis: DataFrame): Boolean =
    g.edges.join(mis, col("src") === col("id")).select("dst")
      .join(mis, col("dst") === col("id")).count() == 0

  private def isMaximal(g: GraphFrame, mis: DataFrame): Boolean = {
    val und = g.asUndirected()
    val notIn = und.vertices.join(mis, Seq("id"), "left_anti").count()
    val touching = und.edges.join(mis, col("id") === col("dst"))
      .select("src").distinct()
      .join(mis.select(col("id").as("src")), Seq("src"), "left_anti").count()
    notIn == touching
  }

  test("MIS: isolated vertices are always included") {
    val v = Seq((0L, "a"), (1L, "b"), (2L, "c"), (3L, "d")).toDF("id", "name")
    val e = Seq((0L, 1L)).toDF("src", "dst")
    val mis = GraphFrame(v, e).maximalIndependentSet.seed(12345L).run()
    val ids = mis.select("id").as[Long].collect().toSet
    assert(ids.size == 3 && ids.contains(2L) && ids.contains(3L))
  }

  test("MIS: independent and maximal under multiple seeds") {
    for (s <- Seq(12345L, 23456L)) {
      val mis = friends.maximalIndependentSet.seed(s).run()
      assert(isIndependent(friends, mis), s"seed $s: not independent")
      assert(isMaximal(friends, mis), s"seed $s: not maximal")
    }
  }

  test("MIS: empty graph, single vertex, complete graph") {
    val noV = spark.emptyDataset[Long].toDF("id")
    val noE = spark.emptyDataset[(Long, Long)].toDF("src", "dst")
    assert(GraphFrame(noV, noE).maximalIndependentSet.run().count() == 0)

    val one = GraphFrame(Seq(0L).toDF("id"), noE).maximalIndependentSet.run()
    assert(one.select("id").as[Long].collect().toSeq == Seq(0L))

    val k5e = (for { i <- 0L until 5L; j <- (i + 1) until 5L } yield (i, j))
      .toDF("src", "dst")
    val k5 = GraphFrame((0L until 5L).toDF("id"), k5e)
    assert(k5.maximalIndependentSet.seed(12345L).run().count() == 1)
  }

  // ------------- Cycles (reference DetectingCyclesSuite.scala:43-62) -------------

  test("detectingCycles: multiple cycles from one source") {
    val v = (1L to 5L).toDF("id")
    val e = Seq((1L, 2L), (2L, 1L), (1L, 3L), (3L, 1L), (2L, 5L), (5L, 1L))
      .toDF("src", "dst")
    val found = GraphFrame(v, e).detectingCycles.run()
      .as[Seq[Long]].collect().toSet
    // this engine prints cycles without the closing repeat
    assert(found == Set(Seq(1L, 2L), Seq(1L, 2L, 5L), Seq(1L, 3L)))
  }

  // ------------- ShortestPaths special column names (reference ShortestPathsSuite) -------------

  test("shortestPaths keeps dotted and backquoted vertex attribute columns") {
    val v = Seq((1L, "x", "y"), (2L, "p", "q"), (3L, "r", "s"))
      .toDF("id", "a.dot", "a`tick")
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val res = GraphFrame(v, e).shortestPaths.landmarks(Seq(3L)).run()
    assert(res.columns.toSet == Set("id", "a.dot", "a`tick", "distances"))
    val d = res.select(col("id"), map_values(col("distances"))(0))
      .as[(Long, Int)].collect().toMap
    assert(d == Map(1L -> 2, 2L -> 1, 3L -> 0))
  }

  // ------------- AggregateNeighbors path mode (reference AggregateNeighborsSuite) -------------

  /** Diamond: 1 -> {2,3} -> 4. */
  private def diamond: GraphFrame = {
    val v = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D")).toDF("id", "name")
    val e = Seq((1L, 2L, 1.0), (1L, 3L, 2.0), (2L, 4L, 3.0), (3L, 4L, 4.0))
      .toDF("src", "dst", "w")
    GraphFrame(v, e)
  }

  test("path mode: all paths between two vertices with a path accumulator") {
    val res = diamond.aggregateNeighbors
      .setStartingVertices(col("id") === 1L)
      .setMaxHops(5)
      .setTargetCondition(AggregateNeighbors.dstAttr("id") === 4L)
      .addAccumulator("path", array(col("id")),
        array_append(col("path"), AggregateNeighbors.dstAttr("id")))
      .run()
    val paths = res.select("path").as[Seq[Long]].collect().toSet
    assert(paths == Set(Seq(1L, 2L, 4L), Seq(1L, 3L, 4L)))
    assert(res.select("hop").as[Int].collect().toSet == Set(2))
    assert(res.select("id").as[Long].collect().toSet == Set(4L))
  }

  test("path mode: multiple accumulators update in lockstep") {
    val res = diamond.aggregateNeighbors
      .setStartingVertices(col("id") === 1L)
      .setMaxHops(2)
      .setTargetCondition(AggregateNeighbors.dstAttr("id") === 4L)
      .addAccumulator("cost", lit(0.0), col("cost") + AggregateNeighbors.edgeAttr("w"))
      .addAccumulator("steps", lit(0), col("steps") + 1)
      .run()
    val rows2 = res.select("cost", "steps").as[(Double, Int)].collect().toSet
    assert(rows2 == Set((4.0, 2), (6.0, 2)))
  }

  test("path mode: stopping condition prunes revisits (reference 'stopping condition')") {
    // 1->2->3->1 cycle plus chords; visited-set stopping keeps it finite
    val v = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("id", "name")
    val e = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 3L), (2L, 1L)).toDF("src", "dst")
    val res = GraphFrame(v, e).aggregateNeighbors
      .setStartingVertices(col("id") === 1L)
      .setMaxHops(10)
      .setStoppingCondition(
        array_contains(col("visited"), AggregateNeighbors.dstAttr("id")))
      .addAccumulator("visited", array(lit(1L)),
        array_append(col("visited"), AggregateNeighbors.dstAttr("id")))
      .run()
    // every saved row stopped on a revisit; traversal terminated well before maxHops
    val visited = res.select("visited").as[Seq[Long]].collect()
    assert(visited.nonEmpty)
    assert(visited.forall(p => p.size <= 4))
  }

  test("path mode: edge filter restricts traversal to matching edge types") {
    val v = Seq((1L, "A"), (2L, "B"), (3L, "C"), (4L, "D")).toDF("id", "name")
    val e = Seq((1L, 2L, "friend"), (2L, 3L, "colleague"), (3L, 4L, "friend"),
      (1L, 3L, "colleague"), (2L, 4L, "friend")).toDF("src", "dst", "edgeType")
    val res = GraphFrame(v, e).aggregateNeighbors
      .setStartingVertices(col("id") === 1L)
      .setMaxHops(3)
      .setEdgeFilter(AggregateNeighbors.edgeAttr("edgeType") === "friend")
      .setTargetCondition(AggregateNeighbors.dstAttr("id") === 4L)
      .addAccumulator("path", array(col("id")),
        array_append(col("path"), AggregateNeighbors.dstAttr("id")))
      .run()
    val paths = res.select("path").as[Seq[Long]].collect().toSet
    assert(paths == Set(Seq(1L, 2L, 4L))) // 1-3-4 blocked: 1->3 is colleague
  }

  test("path mode: self-loops traverse unless removeLoops(true)") {
    val v = Seq((1L, "A"), (2L, "B"), (3L, "C")).toDF("id", "name")
    val e = Seq((1L, 2L), (2L, 2L), (2L, 3L)).toDF("src", "dst")
    def base = GraphFrame(v, e).aggregateNeighbors
      .setStartingVertices(col("id") === 1L)
      .setMaxHops(3)
      .setTargetCondition(AggregateNeighbors.dstAttr("id") === 3L)
      .addAccumulator("path", array(col("id")),
        array_append(col("path"), AggregateNeighbors.dstAttr("id")))
    val withLoop = base.run().select("path").as[Seq[Long]].collect().toSet
    assert(withLoop == Set(Seq(1L, 2L, 3L), Seq(1L, 2L, 2L, 3L)))
    val noLoop = base.setRemoveLoops(true).run()
      .select("path").as[Seq[Long]].collect().toSet
    assert(noLoop == Set(Seq(1L, 2L, 3L)))
  }

  test("path mode: star fan-out yields one finished row per leaf") {
    val n = 100
    val v = (0L to n.toLong).toDF("id")
    val e = (1L to n.toLong).map(i => (0L, i)).toDF("src", "dst")
    val res = GraphFrame(v, e).aggregateNeighbors
      .setStartingVertices(col("id") === 0L)
      .setMaxHops(2)
      .setStoppingCondition(lit(true))
      .addAccumulator("last", col("id"), AggregateNeighbors.dstAttr("id"))
      .run()
    assert(res.count() == n)
    assert(res.select("last").as[Long].collect().toSet == (1L to n.toLong).toSet)
  }
}
