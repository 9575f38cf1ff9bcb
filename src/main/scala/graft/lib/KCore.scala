package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame
import graft.expressions.KCoreMerge

/**
 * K-core decomposition (semantics: reference lib/KCore.scala:37-108):
 * every vertex's coreness — the largest k such that the vertex belongs to
 * a subgraph where all degrees are >= k.
 *
 * Pregel fixpoint: core starts at (undirected) degree; each round a vertex
 * recomputes core = KCoreMerge(neighbor cores, core) — a capped h-index,
 * evaluated by a native codegen'd Catalyst expression — and the loop halts
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

    val newCore = when(Pregel.msg.isNull, col("kcore"))
      .otherwise(KCoreMerge.kcoreMerge(Pregel.msg, col("kcore")))

    g2.pregel
      .withVertexColumn("kcore", col("degree"), newCore)
      .sendMsgToSrc(Pregel.dst("kcore"))
      .sendMsgToDst(Pregel.src("kcore"))
      .aggMsgs(collect_list(Pregel.msg))
      .setMaxIter(maxIterV)
      .setInitialActiveVertexExpression(lit(true))
      .setUpdateActiveVertexExpression(newCore =!= col("kcore"))
      .setStopIfAllNonActiveVertices(true)
      .run()
      .drop("degree")
  }
}
