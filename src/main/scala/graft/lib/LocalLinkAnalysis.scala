package graft.lib

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
import graft.GraphFrame

/**
 * Bounded driver-side tail for small-graph power iterations (Hits, Katz) —
 * the same pattern and rationale as ConnectedComponents.finishWithUnionFind:
 * below a (conf-settable, 0-disables) edge threshold, per-round distributed
 * supersteps are pure fixed scheduling overhead, so the iteration finishes
 * in one collect + local loop + broadcast join-back. The round-8 cadence
 * experiment (see IterationManager) showed this is the ONLY safe way to cut
 * small-graph latency: skipping lineage cuts instead blows up the analyzer.
 *
 * Semantics parity with the distributed joins is exact by construction:
 *  - edges whose endpoint is absent from the vertex table contribute
 *    nothing (the distributed state join drops them);
 *  - null endpoints contribute nothing (join keys never match null);
 *  - multi-edges are kept (the distributed sum counts duplicates);
 *  - accumulation runs in sorted-edge order, so the result is a pure
 *    function of the graph VALUE — partition-count invariant.
 */
private[lib] object LocalLinkAnalysis {
  /** Collect `(src, dst)` pairs (sorted, null-free) plus the endpoint ids
   * that actually exist in the vertex table. Two bounded jobs: the edge
   * collect reads the caller's cache; the endpoint filter is a semi-join
   * of the (huge) vertex table against the (small) endpoint set. */
  def collectGraph(e: DataFrame, g: GraphFrame): (Array[(Any, Any)], Array[Any]) = {
    import GraphFrame.{ID, SRC, DST}
    val edges = e.collect().iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.get(0), r.get(1))).toArray
      .sortBy { case (s, d) => (String.valueOf(s), String.valueOf(d)) }
    val epDF = e.select(col(SRC).as(ID)).union(e.select(col(DST).as(ID))).distinct()
    val valid = g.vertices.select(col(ID)).join(epDF, Seq(ID), "left_semi")
      .collect().map(_.get(0))
      .sortBy(String.valueOf(_))
    (edges, valid)
  }

  /** Local relation `(id, <scores...>)` with the graph's own id type,
   * broadcast-joined back onto the full vertex table; `fill` supplies the
   * closed-form score of vertices that touch no edge. */
  def joinBack(g: GraphFrame, ids: Array[Any], scores: Seq[(String, Any => Double, Double)])
      : DataFrame = {
    import GraphFrame.ID
    val spark: SparkSession = g.vertices.sparkSession
    val idField = g.vertices.schema(ID)
    val schema = StructType(StructField(ID, idField.dataType, nullable = true) +:
      scores.map { case (n, _, _) => StructField(n, DoubleType, nullable = false) })
    val rows: java.util.List[Row] = java.util.Arrays.asList(
      ids.map(v => Row.fromSeq(v +: scores.map(_._2(v)))): _*)
    var out = g.vertices.join(broadcast(spark.createDataFrame(rows, schema)),
      Seq(ID), "left_outer")
    for ((n, _, fill) <- scores)
      out = out.withColumn(n, coalesce(col(n), lit(fill)))
    out
  }
}
