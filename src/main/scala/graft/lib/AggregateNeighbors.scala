package graft.lib

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Multi-hop neighborhood aggregation (role of reference
 * lib/AggregateNeighbors.scala:43-459): for every origin vertex, walk the
 * frontier outward hop by hop and aggregate expressions over the
 * hop-h neighbors. Returns `(id, hop, <one column per aggregate>)` with
 * one row per origin per hop.
 *
 * Aggregate expressions reference the neighbor row via
 * [[AggregateNeighbors.nbr]].
 *
 * Scale: the edge table is shaped once as (src, neighbor-struct),
 * pre-partitioned on the join key and cached; each hop is one join plus a
 * hash aggregation on origin, and the frontier is the only per-hop state.
 */
class AggregateNeighbors(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}
  import AggregateNeighbors.NBR

  private val aggs = ArrayBuffer.empty[Column]
  private var maxHops: Int = 1
  private var edgeFilterV: Option[Column] = None
  private var targetConditionV: Option[Column] = None
  private var dedupNeighbors: Boolean = false
  private var removeLoops: Boolean = true

  /** Aggregates computed per (origin, hop) over neighbor rows. */
  def agg(cols: Column*): this.type = { aggs ++= cols; this }
  def setMaxHops(n: Int): this.type = { maxHops = n; this }
  /** Pre-filter on edge attributes before any traversal. */
  def setEdgeFilter(cond: Column): this.type = { edgeFilterV = Some(cond); this }
  /** Keep only neighbors whose row satisfies `cond` (applied per hop,
   * after traversal — the walk itself is unrestricted). */
  def setTargetCondition(cond: Column): this.type = { targetConditionV = Some(cond); this }
  /** Count each distinct vertex once per (origin, hop) instead of once per
   * path. */
  def setDedupNeighbors(b: Boolean): this.type = { dedupNeighbors = b; this }
  /** Drop frontier entries that return to the origin (default true). */
  def setRemoveLoops(b: Boolean): this.type = { removeLoops = b; this }

  def run(): DataFrame = {
    require(aggs.nonEmpty, "aggregateNeighbors: at least one aggregate required")
    val edges0 = edgeFilterV.map(g.edges.filter).getOrElse(g.edges)
    // (src, neighbor-id, neighbor-struct), co-partitioned by src for reuse
    val nbrTable = edges0.select(col(SRC).as("_an_src"), col(DST).as("_an_dst"))
      .join(g.vertices.select(col(ID).as("_an_dst"), GraphFrame.nestAsCol(g.vertices, NBR)),
        "_an_dst")
      .repartition(col("_an_src"))
      .persist()

    val mgr = IterationManager.withReliableDir(g.spark, None)
    // frontier: (origin, current)
    var frontier = g.vertices.select(col(ID).as("_an_origin"), col(ID).as("_an_cur"))
    val results = ArrayBuffer.empty[DataFrame]
    var hop = 1
    var exhausted = false
    while (hop <= maxHops && !exhausted) {
      var stepped = frontier.join(nbrTable, col("_an_cur") === col("_an_src"))
        .select(col("_an_origin"), col("_an_dst"), col(NBR))
      if (removeLoops) stepped = stepped.filter(col("_an_origin") =!= col("_an_dst"))
      if (dedupNeighbors)
        stepped = stepped.dropDuplicates("_an_origin", "_an_dst")
      val kept = targetConditionV.map(stepped.filter).getOrElse(stepped)
      val agged = kept.groupBy(col("_an_origin").as(ID))
        .agg(aggs.head, aggs.tail.toSeq: _*)
      val accCols = agged.columns.filter(_ != ID)
      results += agged.select(
        (col(ID) +: lit(hop).as("hop") +: accCols.map(col).toSeq).toIndexedSeq: _*)
      frontier = mgr.cycle(
        stepped.select(col("_an_origin"), col("_an_dst").as("_an_cur")), hop)
      exhausted = frontier.isEmpty
      hop += 1
    }
    val out = mgr.finish(results.reduce(_ unionByName _))
    nbrTable.unpersist(false)
    out
  }
}

object AggregateNeighbors {
  private[graft] val NBR = "nbr"
  /** Field of the neighbor's vertex row inside aggregate expressions. */
  def nbr(field: String): Column = col(s"$NBR.$field")
}
