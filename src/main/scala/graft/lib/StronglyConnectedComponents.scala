package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Strongly connected components via the coloring algorithm (role of
 * reference lib/StronglyConnectedComponents.scala — GraphX-only there;
 * re-expressed here on DataFrames, per SURVEY §7 step 9).
 *
 * Outer rounds until every vertex is assigned:
 *   1. color propagation: color = max(own id, colors arriving along
 *      forward edges), iterated to fixpoint → each vertex's color is the
 *      max vertex id that can reach it;
 *   2. backward sweep from each color root (vertex whose id == its color)
 *      along reversed edges, restricted to same-color vertices → exactly
 *      the SCC of the root;
 *   3. assign, peel off, repeat on the remainder.
 *
 * Output: original vertices + `component: long`.
 */
class StronglyConnectedComponents(g: GraphFrame) {
  import GraphFrame.{ID, LONG_ID, LONG_SRC, LONG_DST}

  private var maxIterV: Int = 100

  def maxIter(n: Int): this.type = { maxIterV = n; this }

  def run(): DataFrame = {
    val iv = g.indexedVertices.select(col(LONG_ID).as("vid"), col(ID))
    val e0 = g.indexedEdges
      .select(col(LONG_SRC).as("src"), col(LONG_DST).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    val remMgr = new IterationManager()
    val reMgr = new IterationManager()
    var rem = remMgr.persistOnly(iv.select(col("vid")))
    var re = reMgr.persistOnly(e0)
    val assignedParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    var outer = 0
    while (outer < maxIterV && rem.take(1).nonEmpty) {
      // -- forward max-color fixpoint --
      var colors = rem.select(col("vid"), col("vid").as("color"))
      val cmgr = new IterationManager()
      colors = cmgr.persistOnly(colors)
      // the color sum strictly increases while anything changes (colors
      // only ever grow), so a stable checksum == fixpoint — no self-join
      var prevSum = colors.agg(sum(col("color")).cast(
        org.apache.spark.sql.types.DecimalType(38, 0))).head().get(0)
      var changed = true
      var it = 0
      while (changed) {
        val msgs = re.join(colors.select(col("vid").as("src"), col("color")), Seq("src"))
          .groupBy(col("dst").as("vid")).agg(max("color").as("inMax"))
        val next = colors.join(msgs, Seq("vid"), "left_outer")
          .select(col("vid"), greatest(col("color"), coalesce(col("inMax"), col("color"))).as("color"))
        val nextP = cmgr.cycle(next, it)
        val s = nextP.agg(sum(col("color")).cast(
          org.apache.spark.sql.types.DecimalType(38, 0))).head().get(0)
        changed = s != prevSum
        prevSum = s
        colors = nextP
        it += 1
      }
      // -- backward reachability from color roots within same color --
      val colorsP = colors
      // same-color edges, reversed (walk from dst back to src)
      val sameColorRev = re
        .join(colorsP.select(col("vid").as("src"), col("color").as("_c1")), Seq("src"))
        .join(colorsP.select(col("vid").as("dst"), col("color").as("_c2")), Seq("dst"))
        .filter(col("_c1") === col("_c2"))
        .select(col("dst").as("from"), col("src").as("to"))
      val bmgr = new IterationManager()
      val sameColorRevP = bmgr.persistOnly(sameColorRev)
      var reached = bmgr.persistOnly(
        colorsP.filter(col("vid") === col("color")).select(col("vid"), col("color")))
      var frontier = reached
      var bIt = 0
      var growing = true
      while (growing) {
        val nxt = sameColorRevP.join(
            frontier.select(col("vid").as("from"), col("color")), Seq("from"))
          .select(col("to").as("vid"), col("color"))
          .distinct()
          .join(reached.select("vid"), Seq("vid"), "left_anti")
        val nxtP = bmgr.persistOnly(nxt)
        growing = nxtP.take(1).nonEmpty
        if (growing) {
          reached = bmgr.persistOnly(reached.unionAll(nxtP))
          frontier = nxtP
        }
        bIt += 1
      }
      val part = reached.select(col("vid"), col("color").as("component"))
        .persist()
      part.count()
      assignedParts += part
      rem = remMgr.cycle(rem.join(part.select("vid"), Seq("vid"), "left_anti"), outer)
      re = reMgr.cycle(
        re.join(part.select(col("vid").as("src")), Seq("src"), "left_anti")
          .join(part.select(col("vid").as("dst")), Seq("dst"), "left_anti")
          .select("src", "dst"),
        outer)
      cmgr.close(); bmgr.close()
      outer += 1
    }

    val assigned = assignedParts.reduceOption(_ unionAll _)
      .getOrElse(iv.limit(0).select(col("vid"), col("vid").as("component")))
    val out = g.vertices.join(
      iv.join(assigned, Seq("vid"), "left_outer")
        .select(col(ID), coalesce(col("component"), col("vid")).as("component")),
      Seq(ID), "left_outer")
      .persist()
    out.count()
    remMgr.close(); reMgr.close()
    assignedParts.foreach(_.unpersist(false))
    out
  }
}
