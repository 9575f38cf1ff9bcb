package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Exact per-vertex triangle counting (semantics: reference
 * lib/TriangleCount.scala:158-200).
 *
 * Plan: canonicalize to an undirected simple graph (src < dst, no loops,
 * distinct), build each vertex's neighbor set with one hash aggregation,
 * join the sets onto each canonical edge, and count common neighbors with
 * `array_intersect`. Each triangle is seen by its three edges; per-vertex
 * totals are summed and halved.
 *
 * Scale note: the neighbor-set join is two shuffles on vertex id; hub
 * vertices produce large sets — AQE skew-join splits those partitions.
 */
class TriangleCount(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  /** Approximate variant using Spark 4.1 theta sketches (reference
   * lib/TriangleCount.scala:99-156): neighbor sets become theta sketches,
   * per-edge common-neighbor counts become intersection estimates. Trades
   * exactness for bounded sketch size on hub vertices — at web scale the
   * exact `collect_set` on a 10^7-degree hub is the thing that OOMs. */
  def runApprox(lgNomEntries: Int = 12): DataFrame = {
    val canon = canonical
    val nbrSk = canon.select(col(SRC).as(ID), col(DST).as("nb"))
      .unionAll(canon.select(col(DST).as(ID), col(SRC).as("nb")))
      .groupBy(ID).agg(expr(s"theta_sketch_agg(nb, $lgNomEntries)").as("sk"))
    val perEdge = canon
      .join(nbrSk.select(col(ID).as(SRC), col("sk").as("_tc_ss")), SRC)
      .join(nbrSk.select(col(ID).as(DST), col("sk").as("_tc_ds")), DST)
      .select(col(SRC), col(DST),
        expr("theta_sketch_estimate(theta_intersection(_tc_ss, _tc_ds))").as("_tc_c"))
    val perVertex = perEdge
      .select(explode(array(col(SRC), col(DST))).as(ID), col("_tc_c"))
      .groupBy(ID).agg(floor(sum(col("_tc_c")) / 2).cast("long").as("count"))
    g.vertices.join(perVertex, Seq(ID), "left_outer")
      .na.fill(0, Seq("count"))
  }

  private def canonical: DataFrame =
    g.edges
      .filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
      .distinct()

  def run(): DataFrame = {
    val canon = g.edges
      .filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
      .distinct()

    // undirected neighbor sets from canonical edges
    val nbrs = canon.select(col(SRC).as(ID), col(DST).as("nb"))
      .unionAll(canon.select(col(DST).as(ID), col(SRC).as("nb")))
      .groupBy(ID).agg(collect_set(col("nb")).as("nbrs"))

    val withSets = canon
      .join(nbrs.select(col(ID).as(SRC), col("nbrs").as("_tc_sn")), SRC)
      .join(nbrs.select(col(ID).as(DST), col("nbrs").as("_tc_dn")), DST)
      .select(col(SRC), col(DST),
        array_size(array_intersect(col("_tc_sn"), col("_tc_dn"))).as("_tc_c"))

    val perVertex = withSets
      .select(explode(array(col(SRC), col(DST))).as(ID), col("_tc_c"))
      .groupBy(ID).agg((sum(col("_tc_c")) / 2).cast("long").as("count"))

    g.vertices.join(perVertex, Seq(ID), "left_outer")
      .na.fill(0, Seq("count"))
  }
}
