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
 * rule). The frequency histogram is a map built with a higher-order
 * `aggregate` over collected messages — no UDFs, fully codegen-able.
 */
class LabelPropagation(g: GraphFrame) {
  import GraphFrame.ID

  private var maxIterV: Int = 5
  private var directed: Boolean = true

  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Undirected mode sends labels across edges in both directions. */
  def setDirected(d: Boolean): this.type = { directed = d; this }

  def run(): DataFrame = {
    val idType = g.vertices.schema(ID).dataType
    val emptyHist = map().cast(org.apache.spark.sql.types.MapType(
      idType, org.apache.spark.sql.types.IntegerType, valueContainsNull = false))

    // histogram of incoming labels
    val hist = aggregate(collect_list(Pregel.msg), emptyHist,
      (acc, l) => map_zip_with(acc, map(l, lit(1)),
        (_, a, b) => coalesce(a, lit(0)) + coalesce(b, lit(0))))

    // most frequent label, smallest label wins ties:
    // min over (-count, label) — works for any orderable label type
    val best = array_min(transform(map_entries(Pregel.msg),
      e => struct((-e.getField("value")).as("negCount"), e.getField("key").as("label"))))
      .getField("label")
    val newLabel = when(Pregel.msg.isNull || size(Pregel.msg) === 0, col("label"))
      .otherwise(best)

    val pregel = g.pregel
      .withVertexColumn("label", col(ID), newLabel)
      .sendMsgToDst(Pregel.src("label"))
      .aggMsgs(hist)
      .setMaxIter(maxIterV)
    if (!directed) pregel.sendMsgToSrc(Pregel.dst("label"))
    pregel.run()
  }
}
