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
  private var reliableDirV: Option[String] = None

  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Reliable checkpointing under `dir` (see ConnectedComponents). */
  def setUseReliableCheckpoint(dir: String): this.type = {
    reliableDirV = Some(dir); this
  }

  private def newMgr(): IterationManager =
    IterationManager.withReliableDir(g.spark, reliableDirV)

  def run(): DataFrame = {
    val iv = g.indexedVertices.select(col(LONG_ID).as("vid"), col(ID))
    val e0 = g.indexedEdges
      .select(col(LONG_SRC).as("src"), col(LONG_DST).as("dst"))
      .filter(col("src") =!= col("dst"))
      .distinct()

    val remMgr = newMgr()
    val reMgr = newMgr()
    var rem = remMgr.persistOnly(iv.select(col("vid")))
    var re = reMgr.persistOnly(e0)
    val assignedParts = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    var outer = 0
    while (outer < maxIterV && rem.take(1).nonEmpty) {
      // -- forward max-color fixpoint, frontier-gated: only vertices whose
      // color changed last round send (every vertex sends once in round 1,
      // so each edge's initial color propagates; thereafter any increase
      // re-propagates — standard delta iteration for a monotone max).
      // Empty frontier == fixpoint, so the loop needs ONE frontier-sized
      // probe per round instead of a full-table checksum, and each round
      // joins only frontier-adjacent edges rather than the whole edge set.
      val cmgr = newMgr()
      var colors = cmgr.cycle(
        rem.select(col("vid"), col("vid").as("color"), lit(true).as("_chg")), 0)
      var it = 1
      while (colors.filter(col("_chg")).take(1).nonEmpty) {
        val frontier = colors.filter(col("_chg"))
          .select(col("vid").as("src"), col("color"))
        val msgs = re.join(frontier, Seq("src"))
          .groupBy(col("dst").as("vid")).agg(max("color").as("inMax"))
        val next = colors.select("vid", "color").join(msgs, Seq("vid"), "left_outer")
          .select(col("vid"),
            greatest(col("color"), coalesce(col("inMax"), col("color"))).as("color"),
            (col("inMax").isNotNull && col("inMax") > col("color")).as("_chg"))
        colors = cmgr.cycle(next, it)
        it += 1
      }
      // -- backward reachability from color roots within same color --
      val colorsP = colors.select("vid", "color")
      // same-color edges, reversed (walk from dst back to src)
      val sameColorRev = re
        .join(colorsP.select(col("vid").as("src"), col("color").as("_c1")), Seq("src"))
        .join(colorsP.select(col("vid").as("dst"), col("color").as("_c2")), Seq("dst"))
        .filter(col("_c1") === col("_c2"))
        .select(col("dst").as("from"), col("src").as("to"))
      val bmgr = newMgr()
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
