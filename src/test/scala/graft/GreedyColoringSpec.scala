package graft

import org.apache.spark.sql.functions._

class GreedyColoringSpec extends TestBase {
  import spark.implicits._

  private def colors(g: GraphFrame, mode: String = "md5",
      threshold: Long = 100000L): Map[Any, Int] =
    g.greedyColoring.setHashMode(mode).setSmallGraphThreshold(threshold).run()
      .select("id", "color").collect()
      .map(r => (r.get(0), r.getInt(1))).toMap

  private def assertProper(g: GraphFrame, m: Map[Any, Int]): Unit =
    for (r <- g.edges.select("src", "dst").collect()
         if r.get(0) != r.get(1))
      assert(m(r.get(0)) != m(r.get(1)),
        s"edge ${r.get(0)} - ${r.get(1)} shares color ${m(r.get(0))}")

  test("proper coloring on the friends graph; isolated vertex colors 0") {
    val m = colors(friends)
    assertProper(friends, m)
    assert(m("g") == 0) // isolated: wins round 0 of color 0
    assert(m.values.max <= 3) // max undirected degree 3 => at most 4 colors
  }

  test("local md5 tail == distributed md5 supersteps") {
    val local = colors(friends, threshold = 100000L)
    val dist = colors(friends, threshold = 0L)
    assert(local == dist)
  }

  test("xxhash64 mode colors properly too (distributed only)") {
    val g = twoBlobs(4)
    val m = colors(g, mode = "xxhash64")
    assertProper(g, m)
    // each 4-clique needs exactly 4 colors
    assert(m.filterKeys(k => (0L to 3L).contains(k)).values.toSet.size == 4)
  }

  test("complete graph needs n colors; chain needs 2") {
    val k4 = {
      val v = (0L to 3L).toDF("id")
      val e = (for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j))
        .toDF("src", "dst")
      GraphFrame(v, e)
    }
    val mk = colors(k4)
    assertProper(k4, mk)
    assert(mk.values.toSet == Set(0, 1, 2, 3))
    val mc = colors(chain(5))
    assertProper(chain(5), mc)
    assert(mc.values.max <= 1)
  }

  test("maxColors cap marks the overflow loudly with -1") {
    val k4 = {
      val v = (0L to 3L).toDF("id")
      val e = (for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j))
        .toDF("src", "dst")
      GraphFrame(v, e)
    }
    val m = k4.greedyColoring.setHashMode("md5").maxColors(2).run()
      .select("id", "color").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(m.values.count(_ == -1) == 2) // 2 of 4 clique vertices overflow
  }
}
