package graft

import org.apache.spark.sql.functions._

/** node2vec-biased random walks: determinism, the p/q bias contracts, and
 * mode interplay (restart resets prev; p=q=1 stays on the unbiased path). */
class Node2VecSpec extends TestBase {
  import spark.implicits._

  /** Bidirectional triangle 0-1-2. */
  private def triangle: GraphFrame = {
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L), (1L, 0L), (1L, 2L), (2L, 1L), (0L, 2L), (2L, 0L))
      .toDF("src", "dst")
    GraphFrame(v, e)
  }

  private def walks(g: GraphFrame, p: Double, q: Double, len: Int = 6,
      wpv: Int = 4, seed: Long = 7L): Map[String, Seq[Long]] =
    g.randomWalks.setWalkLength(len).setWalksPerVertex(wpv).setSeed(seed)
      .setReturnParam(p).setInOutParam(q).run()
      .as[(String, Seq[Long])].collect().toMap

  test("biased walks are deterministic under a seed, different under another") {
    val a = walks(triangle, 0.5, 2.0)
    val b = walks(triangle, 0.5, 2.0)
    val c = walks(triangle, 0.5, 2.0, seed = 8L)
    assert(a == b)
    assert(a != c)
    assert(a.values.forall(_.length == 7)) // origin + 6 steps (no dead ends)
  }

  test("huge p forbids immediate backtracking when an alternative exists") {
    // triangle: from any vertex both neighbors exist, one of them is prev;
    // weight 1/2^20 vs 1 makes a return draw need u < ~1e-6 of the mass
    val m = walks(triangle, math.pow(2, 20), 1.0, len = 12, wpv = 8)
    for ((id, path) <- m; i <- 2 until path.length)
      assert(path(i) != path(i - 2),
        s"walk $id backtracked at step $i: $path")
  }

  test("p = q = 1 rides the unbiased draw (identical to no params at all)") {
    val base = triangle.randomWalks.setWalkLength(5).setWalksPerVertex(3)
      .setSeed(3L).run().as[(String, Seq[Long])].collect().toMap
    val unit = walks(triangle, 1.0, 1.0, len = 5, wpv = 3, seed = 3L)
    assert(base == unit)
  }

  test("bias composes with restart (prev resets, walk stays alive)") {
    val m = triangle.randomWalks.setWalkLength(8).setWalksPerVertex(2)
      .setSeed(5L).setRestartProbability(0.3)
      .setReturnParam(0.5).setInOutParam(2.0).run()
      .as[(String, Seq[Long])].collect().toMap
    assert(m.size == 6)
    assert(m.values.forall(_.length == 9))
    // every restarted walk jumps back to its origin
    for ((id, path) <- m) assert(path.head == id.split('#').head.toLong)
  }

  test("dead ends freeze the path in biased mode too") {
    val m = walks(chain(3), 0.5, 2.0, len = 5, wpv = 1)
    assert(m("2#0") == Seq(2L)) // sink: no neighbors at all
    assert(m("0#0") == Seq(0L, 1L, 2L)) // walks off the chain then freezes
  }

  test("invalid p/q rejected") {
    intercept[IllegalArgumentException](triangle.randomWalks.setReturnParam(0.0))
    intercept[IllegalArgumentException](triangle.randomWalks.setInOutParam(-1.0))
  }

  test("weighted walks: zero-weight edges never picked while mass exists") {
    // 0 -> 1 (w=0), 0 -> 2 (w=5): every step from 0 must go to 2
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L, 0.0), (0L, 2L, 5.0), (2L, 0L, 1.0)).toDF("src", "dst", "w")
    val g = GraphFrame(v, e)
    val out = g.randomWalks.setWalkLength(6).setWalksPerVertex(4)
      .setSeed(3L).setWeightCol("w").run()
      .as[(String, Seq[Long])].collect().toMap
    for ((id, path) <- out if id.startsWith("0#") || id.startsWith("2#"))
      assert(!path.contains(1L), s"$id walked through the zero-weight edge: $path")
    // determinism under a seed
    val again = g.randomWalks.setWalkLength(6).setWalksPerVertex(4)
      .setSeed(3L).setWeightCol("w").run()
      .as[(String, Seq[Long])].collect().toMap
    assert(out == again)
  }

  test("weighted walks: parallel edges sum; all-zero neighborhood picks the clamp") {
    // parallel 0->1 edges (2.0 + 3.0) vs single 0->2 (5.0): both directions
    // legal, but the pick distribution must reflect the 5-vs-5 summed mass —
    // sanity: both neighbors appear across many walks
    val v = Seq(0L, 1L, 2L).toDF("id")
    val e = Seq((0L, 1L, 2.0), (0L, 1L, 3.0), (0L, 2L, 5.0),
      (1L, 0L, 1.0), (2L, 0L, 1.0)).toDF("src", "dst", "w")
    val seen = GraphFrame(v, e).randomWalks.setWalkLength(8).setWalksPerVertex(8)
      .setSeed(11L).setWeightCol("w").run()
      .as[(String, Seq[Long])].collect().flatMap(_._2).toSet
    assert(seen.contains(1L) && seen.contains(2L))
    // all-zero out-weights: the cumulative scan's clamp picks the LAST
    // sampled neighbor deterministically (documented)
    val ez = Seq((0L, 1L, 0.0), (1L, 0L, 1.0)).toDF("src", "dst", "w")
    val z = GraphFrame(Seq(0L, 1L).toDF("id"), ez).randomWalks
      .setWalkLength(2).setWalksPerVertex(1).setSeed(5L).setWeightCol("w").run()
      .as[(String, Seq[Long])].collect().toMap
    assert(z("0#0").tail.head == 1L)
  }

  test("weighted walks: null/negative weights rejected eagerly") {
    val v = Seq(0L, 1L).toDF("id")
    val bad = Seq((0L, 1L, -1.0)).toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      GraphFrame(v, bad).randomWalks.setWeightCol("w").run()
    }
  }
}
