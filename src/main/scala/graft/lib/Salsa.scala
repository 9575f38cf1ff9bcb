package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * SALSA — Lempel & Moran's Stochastic Approach for Link-Structure
 * Analysis (engine extension; the random-walk-normalized cousin of
 * [[Hits]], the scoring behind production who-to-follow systems à la
 * Twitter's GraphJet). Per round, over the directed edge set:
 *
 *   authority(j) = Σ_{u→j} hub(u) / outdeg(u)
 *   hub(u)       = Σ_{u→j} authority(j) / indeg(j)   (the NEW authority)
 *
 * i.e. HITS with each endpoint's contribution split evenly among its
 * links — a two-step random walk on the hub/authority bipartition. The
 * normalization makes scores stochastic (mass-preserving on link-
 * complete subgraphs), so hubs with huge fan-out don't dominate the way
 * raw-sum HITS lets them; no overflow guard is needed (values never grow
 * round over round). Output is L1-normalized per column (probability
 * semantics); vertices touching no edge score 0.
 *
 * Float determinism: the per-edge weights 1/outdeg and 1/indeg are
 * computed ONCE and reused each round, and every contribution is the
 * product hub·w — the identical multiset of IEEE operations a SQL replay
 * performs. Multi-edges are collapsed first (degrees count DISTINCT
 * links, the SALSA contract).
 *
 * Scale: identical shuffle shape to [[Hits]] — two hash-aggregated
 * equi-joins per round against a pinned weighted edge frame (one extra
 * degree aggregation up front); rounds through the [[IterationManager]];
 * below the link-analysis threshold a bounded driver tail runs the same
 * recurrence in sorted-edge order (docs/THRESHOLDS.md row 2 family).
 */
class Salsa(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 5
  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)

  def maxIter(n: Int): this.type = {
    require(n >= 1, s"SALSA needs maxIter >= 1, got $n")
    maxIterV = n; this
  }
  /** EDGE-count threshold for the bounded driver tail (0 disables). */
  def setSmallGraphThreshold(n: Long): this.type = { smallGraphThresholdV = n; this }
  /** Rounds chained lazily per lineage cut (default 2; ≤ 8) — see
   * [[Eigenvector.roundsPerCycle]] for the cost model. No overflow guard
   * to clamp to: the walk normalization keeps scores bounded. */
  def roundsPerCycle(k: Int): this.type = {
    require(k >= 1 && k <= 8, s"roundsPerCycle out of [1, 8]: $k")
    roundsPerCycleV = k; this
  }
  private var roundsPerCycleV: Int = 2

  /** Returns vertices + `hub: double`, `authority: double` (each column
   * L1-normalized over all vertices; 0 when the column sums to 0). */
  def run(): DataFrame = {
    val e0 = g.edges.select(col(SRC), col(DST))
      .filter(col(SRC).isNotNull && col(DST).isNotNull)
      .distinct()
      .join(g.vertices.select(col(ID).as(SRC)), Seq(SRC), "left_semi")
      .join(g.vertices.select(col(ID).as(DST)), Seq(DST), "left_semi")
    val od = e0.groupBy(SRC).agg(count(lit(1)).as("_od"))
    val idg = e0.groupBy(DST).agg(count(lit(1)).as("_id"))
    // weights once: each round reuses the same floats
    val e = e0.join(od, SRC).join(idg, DST)
      .select(col(SRC), col(DST),
        (lit(1.0) / col("_od")).as("_wout"), (lit(1.0) / col("_id")).as("_win"))
      .persist()
    if (smallGraphThresholdV > 0 && e.count() <= smallGraphThresholdV) {
      val r = runLocal(e)
      e.unpersist(false)
      return r
    }
    // interval 1: each chunk of roundsPerCycle lazily-chained rounds is
    // one cut, with the final L1 sums fused into the last chunk's job
    val mgr = new IterationManager(1)
    var state = mgr.cycle(
      g.vertices.select(col(ID), lit(1.0).as("hub"), lit(0.0).as("authority")), 0)
    var round = 0
    var cycleIdx = 0
    var sh = 0.0
    var sa = 0.0
    while (round < maxIterV) {
      cycleIdx += 1
      val k = math.min(roundsPerCycleV, maxIterV - round)
      var cur = state
      for (_ <- 1 to k) {
        val aRaw = e.join(cur.select(col(ID).as(SRC), col("hub")), SRC)
          .groupBy(col(DST).as(ID)).agg(sum(col("hub") * col("_wout")).as("_a"))
        val authed = cur.select(col(ID), col("hub"))
          .join(aRaw, Seq(ID), "left_outer")
          .select(col(ID), col("hub"), coalesce(col("_a"), lit(0.0)).as("authority"))
        val hRaw = e.join(authed.select(col(ID).as(DST), col("authority")), DST)
          .groupBy(col(SRC).as(ID)).agg(sum(col("authority") * col("_win")).as("_h"))
        cur = authed.select(col(ID), col("authority"))
          .join(hRaw, Seq(ID), "left_outer")
          .select(col(ID), coalesce(col("_h"), lit(0.0)).as("hub"),
            col("authority"))
      }
      round += k
      if (round >= maxIterV) {
        val (next, obs) = mgr.cycleObserved(cur, cycleIdx,
          Seq(sum("hub"), sum("authority")))
        state = next
        def dbl(a: Any): Double = a match {
          case d: java.lang.Double => d.doubleValue()
          case _ => 0.0
        }
        sh = dbl(obs(0)); sa = dbl(obs(1))
      } else state = mgr.cycle(cur, cycleIdx)
    }
    val result = mgr.finish(g.vertices.join(
      state.select(col(ID),
        (if (sh > 0) col("hub") / sh else lit(0.0)).as("hub"),
        (if (sa > 0) col("authority") / sa else lit(0.0)).as("authority")),
      Seq(ID), "left_outer"))
    e.unpersist(false)
    result
  }

  /** Driver tail: identical recurrence and weight products, sorted-edge
   * accumulation order — a pure function of the graph value. */
  private def runLocal(e: DataFrame): DataFrame = {
    import scala.collection.mutable
    val rows = e.collect().iterator
      .map(r => (r.get(0), r.get(1), r.getDouble(2), r.getDouble(3))).toArray
      .sortBy { case (s, d, _, _) => (String.valueOf(s), String.valueOf(d)) }
    val vids = {
      import org.apache.spark.sql.functions.{col => c}
      val epDF = e.select(c(SRC).as(ID)).union(e.select(c(DST).as(ID))).distinct()
      g.vertices.select(c(ID)).join(epDF, Seq(ID), "left_semi")
        .collect().map(_.get(0)).sortBy(String.valueOf(_))
    }
    var hub = mutable.HashMap.empty[Any, Double]
    var auth = mutable.HashMap.empty[Any, Double]
    vids.foreach { v => hub(v) = 1.0; auth(v) = 0.0 }
    for (_ <- 1 to maxIterV) {
      val a = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => a(v) = 0.0)
      rows.foreach { case (s, d, wout, _) => a(d) += hub(s) * wout }
      val h = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => h(v) = 0.0)
      rows.foreach { case (s, d, _, win) => h(s) += a(d) * win }
      hub = h; auth = a
    }
    val sh = vids.iterator.map(hub).sum
    val sa = vids.iterator.map(auth).sum
    LocalLinkAnalysis.joinBack(g, vids, Seq(
      ("hub", (v: Any) => if (sh > 0) hub(v) / sh else 0.0, 0.0),
      ("authority", (v: Any) => if (sa > 0) auth(v) / sa else 0.0, 0.0)))
  }
}
