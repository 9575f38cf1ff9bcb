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
  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)

  def alpha(a: Double): this.type = { alphaV = a; this }
  def beta(b: Double): this.type = { betaV = b; this }
  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Rounds chained lazily per lineage cut (default 2; ≤ 8) — see
   * [[Eigenvector.roundsPerCycle]] for the cost model (identical: one
   * job + plan compile per k rounds, 2^k-leaf bounded tree). */
  def roundsPerCycle(k: Int): this.type = {
    require(k >= 1 && k <= 8, s"roundsPerCycle out of [1, 8]: $k")
    roundsPerCycleV = k; this
  }
  private var roundsPerCycleV: Int = 2
  /** EDGE-count threshold for the bounded driver-side tail (0 disables);
   * see [[Hits.setSmallGraphThreshold]] for the cost math — identical.
   * Full bounded-path matrix: docs/THRESHOLDS.md. */
  def setSmallGraphThreshold(n: Long): this.type = { smallGraphThresholdV = n; this }

  /** Returns vertices + `katz: double`. */
  def run(): DataFrame = {
    // pinned: re-joined every round, and possibly an expensive upstream query
    val e = g.edges.select(col(SRC), col(DST)).persist()
    if (smallGraphThresholdV > 0 && e.count() <= smallGraphThresholdV) {
      val r = runLocal(e)
      e.unpersist(false)
      return r
    }
    // interval 1: each chunk of roundsPerCycle lazily-chained rounds is
    // one cut/job (no convergence probe, no overflow guard — the series
    // is geometrically damped for sensible α)
    val mgr = new IterationManager(1)
    var state = mgr.cycle(
      g.vertices.select(col(ID), lit(betaV).as("katz")), 0)
    var round = 0
    var cycleIdx = 0
    while (round < maxIterV) {
      cycleIdx += 1
      val k = math.min(roundsPerCycleV, maxIterV - round)
      var cur = state
      for (_ <- 1 to k) {
        val in = e.join(cur.select(col(ID).as(SRC), col("katz")), SRC)
          .groupBy(col(DST).as(ID)).agg(sum("katz").as("_k"))
        cur = cur.select(col(ID))
          .join(in, Seq(ID), "left_outer")
          .select(col(ID),
            (lit(betaV) + lit(alphaV) * coalesce(col("_k"), lit(0.0))).as("katz"))
      }
      round += k
      state = mgr.cycle(cur, cycleIdx)
    }
    val result = mgr.finish(g.vertices.join(state, Seq(ID), "left_outer"))
    e.unpersist(false)
    result
  }

  /** Driver-side tail: identical recurrence, sorted-edge accumulation
   * order. A vertex touching no edge earns exactly β every round — filled
   * in closed form by the join-back. */
  private def runLocal(e: DataFrame): DataFrame = {
    import scala.collection.mutable
    val (edges, vids) = LocalLinkAnalysis.collectGraph(e, g)
    val valid = vids.toSet
    var x = mutable.HashMap.empty[Any, Double]
    vids.foreach(v => x(v) = betaV)
    for (_ <- 1 to maxIterV) {
      val in = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => in(v) = 0.0)
      edges.foreach { case (s, d) =>
        if (valid(s) && valid(d)) in(d) += x(s)
      }
      val nx = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => nx(v) = betaV + alphaV * in(v))
      x = nx
    }
    LocalLinkAnalysis.joinBack(g, vids, Seq(("katz", (v: Any) => x(v), betaV)))
  }
}
