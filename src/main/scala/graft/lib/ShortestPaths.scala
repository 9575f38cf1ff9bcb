package graft.lib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Multi-landmark shortest path (hop count) via Pregel map-state
 * (semantics: reference lib/ShortestPaths.scala:131-254).
 *
 * Vertex state `distances: map<idType,int>` holds the hop count TO each
 * reachable landmark following edge direction (messages flow dst → src).
 * Frontier-style voting: a vertex re-sends only when its map gained keys,
 * so converged regions go quiet and the per-round shuffle shrinks with the
 * frontier. Distances are minimal on first arrival (synchronous BSP on an
 * unweighted graph), hence "map grew" == "state changed".
 */
class ShortestPaths(g: GraphFrame) {
  import GraphFrame.{ID, DST}

  private var landmarksV: Seq[Any] = Nil
  private var maxIterV: Int = Int.MaxValue
  private var directed: Boolean = true

  def landmarks(ls: Seq[Any]): this.type = { landmarksV = ls; this }
  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Treat edges as undirected (propagate both ways). */
  def setDirected(d: Boolean): this.type = { directed = d; this }

  def run(): DataFrame = {
    require(landmarksV.nonEmpty, "shortestPaths: landmarks required")
    val idType = g.vertices.schema(ID).dataType
    val emptyMap = map().cast(org.apache.spark.sql.types.MapType(
      idType, org.apache.spark.sql.types.IntegerType, valueContainsNull = false))

    val init = when(col(ID).isInCollection(landmarksV),
      map(col(ID), lit(0))).otherwise(emptyMap)

    // bump every distance by one hop as it crosses an edge
    def bumped(m: Column): Column = transform_values(m, (_, v) => v + 1)
    // min-merge two maps; `least` ignores the null side
    def mergeMaps(a: Column, b: Column): Column =
      map_zip_with(a, b, (_, v1, v2) => least(v1, v2))

    val msgFromDst = when(size(Pregel.dst("distances")) > 0,
      bumped(Pregel.dst("distances"))).otherwise(lit(null))
    val msgFromSrc = when(size(Pregel.src("distances")) > 0,
      bumped(Pregel.src("distances"))).otherwise(lit(null))

    // buffer bounded by the landmark count, not the receiver's in-degree
    val aggExpr = graft.expressions.IterAggregates.mapMin(Pregel.msg)
    val newDistances = mergeMaps(col("distances"), coalesce(Pregel.msg, emptyMap))

    val pregel = g.pregel
      .withVertexColumn("distances", init, newDistances)
      .sendMsgToSrc(msgFromDst)
      .aggMsgs(aggExpr)
      .setMaxIter(maxIterV)
      .setInitialActiveVertexExpression(size(col("distances")) > 0)
      .setUpdateActiveVertexExpression(size(newDistances) > size(col("distances")))
      .setStopIfAllNonActiveVertices(true)
      .setSkipMessagesFromNonActiveVertices(true)
    if (!directed) pregel.sendMsgToDst(msgFromSrc)
    pregel.run()
  }
}
