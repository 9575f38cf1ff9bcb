package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Directed-cycle enumeration, Rocha–Thatte style (semantics: reference
 * lib/DetectingCycles.scala:14-105).
 *
 * Vertex state is the frontier of simple paths ending at the vertex.
 * A path only propagates to vertices with id >= the path's head, so each
 * cycle is detected exactly once — at its minimum vertex. A path closing
 * on its head is recorded as a found cycle.
 *
 * Output: one row per cycle, `found_cycles: array<idType>` listing the
 * cycle's vertices starting at its minimum.
 */
class DetectingCycles(g: GraphFrame) {
  import GraphFrame.ID

  private var maxIterV: Int = 50

  def maxIter(n: Int): this.type = { maxIterV = n; this }

  def run(): DataFrame = {
    // empty array<array<idType>> literal, valid for any id type
    val emptyPaths = slice(array(array(col(ID))), 1, 0)

    // send each path onward unless extending it below its head would make
    // the cycle discoverable at a smaller vertex too (canonicalization)
    val sendable = filter(Pregel.src("paths"),
      p => element_at(p, 1) <= Pregel.dst(ID))
    val msg = when(size(sendable) > 0, sendable).otherwise(lit(null))

    val incoming = coalesce(Pregel.msg, emptyPaths)
    val closed = filter(incoming, p => element_at(p, 1) === col(ID))
    val continuing = transform(
      filter(incoming, p => element_at(p, 1) =!= col(ID) && !array_contains(p, col(ID))),
      p => array_append(p, col(ID)))

    val res = g.pregel
      .withVertexColumn("paths", array(array(col(ID))), continuing)
      .withVertexColumn("found", emptyPaths, array_union(col("found"), closed))
      .sendMsgToDst(msg)
      .aggMsgs(flatten(collect_list(Pregel.msg)))
      .setMaxIter(maxIterV)
      .setEarlyStopping(true)
      .run()

    res.select(explode(col("found")).as("found_cycles")).distinct()
  }
}
