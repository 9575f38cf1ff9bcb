package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Katz centrality (beyond the reference's library): fixed-iteration
 * power series `x ← β + α · Aᵀ x` — every vertex earns β per round plus
 * α times the centrality of its in-neighbors, counting walks of all
 * lengths with geometric damping (PageRank without the out-degree
 * normalization; convergent for α below the reciprocal spectral radius,
 * and always well-defined at fixed maxIter).
 *
 * Scale: one hash-aggregated edge join per round — the same shuffle
 * shape as a PageRank round — with rounds through the
 * [[IterationManager]].
 */
class Katz(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var alphaV: Double = 0.1
  private var betaV: Double = 1.0
  private var maxIterV: Int = 10

  def alpha(a: Double): this.type = { alphaV = a; this }
  def beta(b: Double): this.type = { betaV = b; this }
  def maxIter(n: Int): this.type = { maxIterV = n; this }

  /** Returns vertices + `katz: double`. */
  def run(): DataFrame = {
    // pinned: re-joined every round, and possibly an expensive upstream query
    val e = g.edges.select(col(SRC), col(DST)).persist()
    val mgr = new IterationManager(2)
    var state = mgr.cycle(
      g.vertices.select(col(ID), lit(betaV).as("katz")), 0)
    for (round <- 1 to maxIterV) {
      val in = e.join(state.select(col(ID).as(SRC), col("katz")), SRC)
        .groupBy(col(DST).as(ID)).agg(sum("katz").as("_k"))
      state = mgr.cycle(state.select(col(ID))
        .join(in, Seq(ID), "left_outer")
        .select(col(ID),
          (lit(betaV) + lit(alphaV) * coalesce(col("_k"), lit(0.0))).as("katz")),
        round)
    }
    val result = mgr.finish(g.vertices.join(state, Seq(ID), "left_outer"))
    e.unpersist(false)
    result
  }
}
