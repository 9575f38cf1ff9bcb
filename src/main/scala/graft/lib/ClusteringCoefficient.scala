package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Local clustering coefficient (engine extension): per vertex,
 * `cc = 2·tri / (d·(d-1))` on the undirected simple graph — how close
 * the vertex's neighborhood is to a clique (Watts-Strogatz'98). Vertices
 * of undirected degree < 2 score 0, not NaN.
 *
 * Execution: delegates triangle counting to [[TriangleCount]] (inheriting
 * its skew-adaptive full-set / degree-oriented path choice and merge-walk
 * intersect kernels) and adds one distinct-neighbor degree aggregation +
 * one join — nothing here grows faster than the triangle count itself.
 *
 * Returns vertices + `tri_count: long`, `clustering_coeff: double`.
 */
class ClusteringCoefficient(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  def run(): DataFrame = {
    val tri = new TriangleCount(g).run()
      .select(col(ID), col("count").as("tri_count"))
    val canon = g.edges
      .filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
      .distinct()
    val deg = canon.select(col(SRC).as(ID))
      .unionAll(canon.select(col(DST).as(ID)))
      .groupBy(ID).agg(count(lit(1)).as("_cc_d"))
    tri.join(deg, Seq(ID), "left_outer")
      .select(col(ID) +: tri.columns.filter(c => c != ID && c != "tri_count")
          .map(col).toSeq :+
        col("tri_count") :+
        when(coalesce(col("_cc_d"), lit(0L)) < 2, lit(0.0))
          .otherwise(lit(2.0) * col("tri_count") /
            (col("_cc_d") * (col("_cc_d") - lit(1L))))
          .as("clustering_coeff"): _*)
  }
}
