package graft.lib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Multi-landmark shortest path via Pregel map-state (semantics:
 * reference lib/ShortestPaths.scala:131-254; the weighted mode is this
 * engine's extension — the reference is hop-count only).
 *
 * Unweighted: vertex state `distances: map<idType,int>` holds the hop
 * count TO each reachable landmark following edge direction (messages
 * flow dst → src). Frontier-style voting: a vertex re-sends only when
 * its map gained keys, so converged regions go quiet and the per-round
 * shuffle shrinks with the frontier. Distances are minimal on first
 * arrival (synchronous BSP on an unweighted graph), hence "map grew" ==
 * "state changed".
 *
 * Weighted ([[weightCol]]): distributed Bellman-Ford — state becomes
 * `map<idType,double>`, each crossing adds the edge's weight, and the
 * frontier is "any entry appeared OR improved" (a later arrival can
 * undercut an existing distance, unlike hop counts). Converges in at
 * most |V| relaxation rounds on non-negative weights; negative weights
 * are rejected up front (a negative cycle would never converge).
 */
class ShortestPaths(g: GraphFrame) {
  import GraphFrame.{ID, DST}

  private var landmarksV: Seq[Any] = Nil
  private var maxIterV: Int = Int.MaxValue
  private var directed: Boolean = true
  private var weightColV: Option[String] = None

  def landmarks(ls: Seq[Any]): this.type = { landmarksV = ls; this }
  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Treat edges as undirected (propagate both ways). */
  def setDirected(d: Boolean): this.type = { directed = d; this }
  /** Weighted mode: distances accumulate this non-negative edge column
   * (cast to double) instead of hop counts. */
  def weightCol(c: String): this.type = { weightColV = Some(c); this }

  def run(): DataFrame = {
    require(landmarksV.nonEmpty, "shortestPaths: landmarks required")
    weightColV.foreach { w =>
      require(g.edges.columns.contains(w), s"shortestPaths: no edge column '$w'")
      // null must fail here too: `null < 0` filters to nothing, and a null
      // weight would otherwise unbox to 0.0 inside the min-merge — a
      // silent zero-cost crossing corrupting every distance through it
      val wc = col(GraphFrame.quoteName(w))
      require(g.edges.filter(wc.isNull || wc < 0).isEmpty,
        s"shortestPaths: null or negative weights in '$w' (Bellman-Ford needs >= 0)")
    }
    val idType = g.vertices.schema(ID).dataType
    val valueType: org.apache.spark.sql.types.DataType =
      if (weightColV.isDefined) org.apache.spark.sql.types.DoubleType
      else org.apache.spark.sql.types.IntegerType
    val emptyMap = map().cast(org.apache.spark.sql.types.MapType(
      idType, valueType, valueContainsNull = false))
    val zero: Column = if (weightColV.isDefined) lit(0.0) else lit(0)

    val init = when(col(ID).isInCollection(landmarksV),
      map(col(ID), zero)).otherwise(emptyMap)

    // bump every distance by one crossing: +1 hop, or + the edge weight
    def bumped(m: Column): Column = weightColV match {
      case Some(w) =>
        transform_values(m, (_, v) => v + Pregel.edge(w).cast("double"))
      case None => transform_values(m, (_, v) => v + 1)
    }
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

    // hop counts can only ADD keys (first arrival is minimal); weighted
    // distances can also IMPROVE existing keys — the frontier test must
    // see both or Bellman-Ford stops one relaxation early.
    // CAUTION: state columns must ride into the HOF as ARGUMENTS, never
    // as references inside a lambda body — the update projection aliases
    // the NEW state under the same name, and a lambda-captured
    // `col("distances")` resolves against that lateral alias (comparing
    // new-to-new, so nothing ever looks improved), while argument
    // expressions resolve against the join child like every non-HOF
    // update expression (PregelPruningSpec pins this).
    val changed: Column =
      if (weightColV.isEmpty) size(newDistances) > size(col("distances"))
      else exists(map_values(
        map_zip_with(col("distances"), coalesce(Pregel.msg, emptyMap),
          (_, o, m) => m.isNotNull && (o.isNull || m < o))), x => x)

    val pregel = g.pregel
      .withVertexColumn("distances", init, newDistances)
      .sendMsgToSrc(msgFromDst)
      .aggMsgs(aggExpr)
      .setMaxIter(maxIterV)
      .setInitialActiveVertexExpression(size(col("distances")) > 0)
      .setUpdateActiveVertexExpression(changed)
      .setStopIfAllNonActiveVertices(true)
      .setSkipMessagesFromNonActiveVertices(true)
    if (!directed) pregel.sendMsgToDst(msgFromSrc)
    pregel.run()
  }
}
