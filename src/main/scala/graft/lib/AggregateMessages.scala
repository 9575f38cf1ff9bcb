package graft.lib

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * One round of message passing: send expressions over triplets to each
 * edge's src and/or dst, then aggregate all messages arriving at each
 * vertex (`groupBy(id).agg(...)`).
 *
 * Message expressions may reference `AggregateMessages.src`, `.edge`,
 * `.dst` (struct columns over the triplet row); aggregation expressions
 * reference `AggregateMessages.msg`.
 *
 * Semantics follow reference lib/AggregateMessages.scala:61-189; the plan
 * is a pure Catalyst composition: triplets join → union of projections →
 * hash aggregate (map-side partial agg applies).
 */
class AggregateMessages(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST, EDGE}
  import AggregateMessages.MSG

  private val toSrc = ArrayBuffer.empty[Column]
  private val toDst = ArrayBuffer.empty[Column]

  /** Message(s) sent to the source vertex of each triplet. */
  def sendToSrc(msgs: Column*): this.type = { toSrc ++= msgs; this }
  def sendToSrc(msg: String): this.type = sendToSrc(expr(msg))
  /** Message(s) sent to the destination vertex of each triplet. */
  def sendToDst(msgs: Column*): this.type = { toDst ++= msgs; this }
  def sendToDst(msg: String): this.type = sendToDst(expr(msg))

  /** Run the round: returns (id, agg1[, agg2, ...]). */
  def agg(aggCol: Column, aggCols: Column*): DataFrame = {
    require(toSrc.nonEmpty || toDst.nonEmpty,
      "aggregateMessages: specify sendToSrc and/or sendToDst first")
    val t = g.triplets
    def msgCol(cols: Seq[Column]): Column =
      if (cols.size == 1) cols.head.as(MSG)
      else struct(cols.toIndexedSeq: _*).as(MSG)
    val parts = ArrayBuffer.empty[DataFrame]
    if (toSrc.nonEmpty)
      parts += t.select(col(s"$SRC.$ID").as(ID), msgCol(toSrc.toSeq))
    if (toDst.nonEmpty)
      parts += t.select(col(s"$DST.$ID").as(ID), msgCol(toDst.toSeq))
    val msgs = parts.reduce(_ unionAll _).filter(col(MSG).isNotNull)
    msgs.groupBy(ID).agg(aggCol, aggCols: _*)
  }
  def agg(aggExpr: String): DataFrame = agg(expr(aggExpr))
}

object AggregateMessages {
  private[graft] val MSG = "MSG"
  /** Source-vertex struct of the triplet (use `src("a")` for a field). */
  def src: Column = col(GraphFrame.SRC)
  def dst: Column = col(GraphFrame.DST)
  def edge: Column = col(GraphFrame.EDGE)
  /** The message column inside `agg` expressions. */
  def msg: Column = col(MSG)
  // field accessors (reference AggregateMessages object's string arms):
  // multi-column sends pack a struct message, read fields with msg("f")
  def src(field: String): Column = col(GraphFrame.SRC).getField(field)
  def dst(field: String): Column = col(GraphFrame.DST).getField(field)
  def edge(field: String): Column = col(GraphFrame.EDGE).getField(field)
  def msg(field: String): Column = col(MSG).getField(field)
}
