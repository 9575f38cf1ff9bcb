package graft.lib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Synchronous community detection by label propagation (CDLP; semantics:
 * reference lib/LabelPropagation.scala:49-146 / LDBC Graphalytics CDLP).
 *
 * Each round every vertex adopts the most frequent label among its
 * incoming neighbors, ties broken toward the smallest label (the LDBC
 * rule). Aggregation is `mode(msg, deterministic = true)` — a
 * `TypedImperativeAggregate` whose buffer is a (label → count) hash map
 * merged map-side, so a 10⁷-degree hub holds one entry per DISTINCT
 * incoming label instead of materializing every message in a
 * `collect_list` buffer (the reference's histogram shape,
 * reference lib/LabelPropagation.scala:132-140, does the latter).
 * Deterministic mode returns the smallest among equally-frequent values —
 * exactly the LDBC tie-break.
 */
class LabelPropagation(g: GraphFrame) {
  import GraphFrame.ID

  private var maxIterV: Int = 5
  private var directed: Boolean = true

  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Undirected mode sends labels across edges in both directions. */
  def setDirected(d: Boolean): this.type = { directed = d; this }

  /** "graphframes" (the only backend) — reference
   * lib/LabelPropagation.scala:58-70 parity; "graphx" is rejected like
   * ConnectedComponents' (this engine has no RDD path, SURVEY §7). */
  def setAlgorithm(a: String): this.type = {
    a match {
      case "graphframes" => this
      case "graphx" => throw new IllegalArgumentException(
        "labelPropagation algorithm 'graphx' is not available: this engine is " +
          "DataFrame-only (no vendored GraphX backend); use 'graphframes'")
      case other => throw new IllegalArgumentException(
        s"unknown labelPropagation algorithm '$other' (supported: graphframes)")
    }
  }

  def run(): DataFrame = {
    // mode() ignores nulls and returns null on an empty group; a vertex
    // with no mail sees a null msg and keeps its label
    val newLabel = when(Pregel.msg.isNull, col("label")).otherwise(Pregel.msg)

    val pregel = g.pregel
      .withVertexColumn("label", col(ID), newLabel)
      .sendMsgToDst(Pregel.src("label"))
      .aggMsgs(mode(Pregel.msg, deterministic = true))
      .setMaxIter(maxIterV)
    if (!directed) pregel.sendMsgToSrc(Pregel.dst("label"))
    pregel.run()
  }
}
