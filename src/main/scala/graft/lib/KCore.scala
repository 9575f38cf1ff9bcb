package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * K-core decomposition (semantics: reference lib/KCore.scala:37-108):
 * every vertex's coreness — the largest k such that the vertex belongs to
 * a subgraph where all degrees are >= k.
 *
 * Pregel fixpoint: core starts at (undirected) degree; each round a vertex
 * recomputes core = capped h-index of its neighbors' cores — combined
 * incrementally by [[graft.expressions.HIndexAgg]] over sender-clamped
 * messages (equivalent to the [[graft.expressions.KCoreMerge]] list
 * kernel, without materializing a hub's inbox) — and the loop halts
 * when no core changed (voting-to-halt). Isolated vertices get core 0.
 *
 * Output: `id, kcore: int` (+ original vertex attributes).
 */
class KCore(g: GraphFrame) {
  import GraphFrame.ID

  private var maxIterV: Int = Int.MaxValue

  def maxIter(n: Int): this.type = { maxIterV = n; this }

  def run(): DataFrame = {
    // undirected simple graph
    val canon = g.edges
      .filter(col(GraphFrame.SRC) =!= col(GraphFrame.DST))
      .select(least(col(GraphFrame.SRC), col(GraphFrame.DST)).as(GraphFrame.SRC),
        greatest(col(GraphFrame.SRC), col(GraphFrame.DST)).as(GraphFrame.DST))
      .distinct()
    val gU = GraphFrame(g.vertices, canon)
    val deg = gU.degrees
    val v = g.vertices.join(deg, Seq(ID), "left_outer").na.fill(0, Seq("degree"))
    val g2 = GraphFrame(v, canon)

    // The sender clamps its core to the receiver's current core: the capped
    // h-index only compares neighbor cores against ranks <= own core, so
    // min(nbr, own) preserves the result exactly while letting the message
    // combine run as a value->count histogram (<= core+1 entries) instead
    // of a collect_list inbox that grows with a hub's degree. The
    // [[KCoreMerge]] list kernel remains the user-facing/SQL form.
    val clamped = least(Pregel.src("kcore"), Pregel.dst("kcore"))
    val newCore = when(Pregel.msg.isNull, col("kcore"))
      .otherwise(least(Pregel.msg, col("kcore")))

    g2.pregel
      .withVertexColumn("kcore", col("degree"), newCore)
      .sendMsgToSrc(clamped)
      .sendMsgToDst(clamped)
      .aggMsgs(graft.expressions.IterAggregates.hIndex(Pregel.msg))
      .setMaxIter(maxIterV)
      .setInitialActiveVertexExpression(lit(true))
      .setUpdateActiveVertexExpression(newCore =!= col("kcore"))
      .setStopIfAllNonActiveVertices(true)
      .run()
      .drop("degree")
  }
}
