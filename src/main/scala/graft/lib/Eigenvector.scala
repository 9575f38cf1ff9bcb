package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Eigenvector centrality (beyond the reference's library): raw power
 * iteration `x ← Aᵀ x` from the all-ones vector, normalized ONCE at the
 * end to sup-norm 1 (the top vertex scores exactly 1.0). A vertex's
 * score is the sum of its in-neighbors' scores — the undamped,
 * un-normalized sibling of PageRank ([[PageRank]] divides by out-degree
 * and damps; [[Katz]] adds a per-round β) — converging to the principal
 * eigenvector of Aᵀ on aperiodic strongly-connected graphs, and always
 * well-defined at fixed `maxIter`.
 *
 * Per-round normalization is skipped deliberately: it only rescales the
 * direction, and skipping keeps each round a single join+agg job (no
 * per-round max action). The same 1e100 overflow guard as [[Hits]]
 * protects user-settable maxIter, on the identical every-8th-round
 * cadence in BOTH paths so local==distributed parity holds even on
 * graphs whose raw sums cross the guard.
 *
 * Scale: one hash-aggregated edge join per round — the same shuffle
 * shape as a PageRank round — with rounds through the
 * [[IterationManager]].
 */
class Eigenvector(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 10
  private var weightColV: Option[String] = None
  private var roundsPerCycleV: Int = 2
  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)

  /** Power-iteration rounds CHAINED LAZILY per lineage cut (default 2).
   * The recurrence is a fixed linear map, so k rounds compose into one
   * plan and each cut pays ONE job + plan compile for k rounds instead
   * of k — the same batching as TemporalReachability.hopsPerCycle, minus
   * the convergence probe (fixed-round loops need none). The state frame
   * is referenced twice per round, so the logical tree holds 2^k copies
   * of the previous CUT's constant-size leaf — keep small (≤ 8; k=4
   * measured WORSE than 2 on the 25-vertex fixtures, bench notes r13
   * §1). Chunks clamp at the every-8th-round overflow-guard boundary so
   * the guard's cadence — and with it local==distributed float parity —
   * is unchanged at any k. */
  def roundsPerCycle(k: Int): this.type = {
    require(k >= 1 && k <= 8, s"roundsPerCycle out of [1, 8]: $k")
    roundsPerCycleV = k; this
  }

  /** Numeric edge column: the recurrence becomes x ← Aᵀ W x (each
   * in-neighbor's score scaled by the edge weight; parallel edges each
   * contribute). Principal-eigenvector semantics need non-negative
   * weights — not enforced, since the fixed-round sum is well-defined
   * either way; the final normalization divides by max |x|. */
  def weightCol(c: String): this.type = { weightColV = Some(c); this }

  /** At least 1: with zero rounds the sup-normalized all-ones vector is
   * not a centrality and the isolated-vertex closed form (0 after any
   * round that sums in-links) would not hold. */
  def maxIter(n: Int): this.type = {
    require(n >= 1, s"eigenvector maxIter must be >= 1, got $n")
    maxIterV = n; this
  }
  /** EDGE-count threshold for the bounded driver-side tail (0 disables);
   * see [[Hits.setSmallGraphThreshold]] for the cost math — identical.
   * Full bounded-path matrix: docs/THRESHOLDS.md. */
  def setSmallGraphThreshold(n: Long): this.type = { smallGraphThresholdV = n; this }

  /** Returns vertices + `eigenvector: double` (sup-norm 1; all-zero —
   * e.g. a vertex with no in-links on a DAG's source layer after enough
   * rounds — stays 0). */
  def run(): DataFrame = {
    // pinned: re-joined every round, and possibly an expensive upstream
    // query. The unweighted path rides the same x·w plan with w = 1.0 —
    // float-identical to a bare sum (x·1.0 == x bit-exactly).
    val wCol = weightColV.map(w => col(graft.GraphFrame.quoteName(w))
      .cast("double")).getOrElse(lit(1.0))
    val e = g.edges.select(col(SRC), col(DST), wCol.as("_w")).persist()
    if (smallGraphThresholdV > 0 && e.count() <= smallGraphThresholdV) {
      val r = runLocal(e)
      e.unpersist(false)
      return r
    }
    // interval 1: every chunk of roundsPerCycle lazily-chained rounds is
    // one cut, and cycleObserved fuses the guard max / final sup-norm
    // into the cut's own job — zero separate driver actions in the loop
    val mgr = new IterationManager(1)
    var state = mgr.cycle(g.vertices.select(col(ID), lit(1.0).as("x")), 0)
    var round = 0
    var cycleIdx = 0
    var norm = 0.0
    while (round < maxIterV) {
      cycleIdx += 1
      // never straddle a guard boundary: the every-8th-round check (same
      // bound, cadence and rescale rule as Hits) must read a materialized
      // frame, and rescale timing changes float rounding
      val k = math.min(roundsPerCycleV,
        math.min(maxIterV, ((round / 8) + 1) * 8) - round)
      var cur = state
      for (_ <- 1 to k) {
        val in = e.join(cur.select(col(ID).as(SRC), col("x")), SRC)
          .groupBy(col(DST).as(ID)).agg(sum(col("x") * col("_w")).as("_x"))
        cur = cur.select(col(ID))
          .join(in, Seq(ID), "left_outer")
          .select(col(ID), coalesce(col("_x"), lit(0.0)).as("x"))
      }
      round += k
      val (next, obs) = mgr.cycleObserved(cur, cycleIdx,
        Seq(max(abs(col("x")))))
      val m = obs.head match {
        case d: java.lang.Double => d.doubleValue()
        case _ => 0.0
      }
      if (round >= maxIterV) { state = next; norm = m }
      else if (round % 8 == 0 && m > 1e100)
        state = next.select(col(ID),
          (col("x") / lit(math.max(m, 1.0))).as("x"))
      else state = next
    }
    val result = mgr.finish(g.vertices.join(
      state.select(col(ID),
        (if (norm > 0) col("x") / norm else lit(0.0)).as("eigenvector")),
      Seq(ID), "left_outer"))
    e.unpersist(false)
    result
  }

  /** Driver-side tail: identical recurrence (raw sums, one final sup-norm
   * normalization), sorted-edge accumulation order so the result is a
   * pure function of the graph value. Vertices touching no edge score 0
   * from round 1 on — filled in closed form by the join-back. */
  private def runLocal(e: DataFrame): DataFrame = {
    import scala.collection.mutable
    // (src, dst, w) with w in the sort key: parallel edges with distinct
    // weights accumulate in a fixed order regardless of partitioning
    val edges = e.collect().iterator
      .filter(r => !r.isNullAt(0) && !r.isNullAt(1))
      .map(r => (r.get(0), r.get(1), if (r.isNullAt(2)) 0.0 else r.getDouble(2)))
      .toArray
      .sortBy { case (s, d, w) => (String.valueOf(s), String.valueOf(d), w) }
    val epDF = e.select(col(SRC).as(ID)).union(e.select(col(DST).as(ID))).distinct()
    val vids = g.vertices.select(col(ID)).join(epDF, Seq(ID), "left_semi")
      .collect().map(_.get(0)).sortBy(String.valueOf(_))
    val valid = vids.toSet
    var x = mutable.HashMap.empty[Any, Double]
    vids.foreach(v => x(v) = 1.0)
    for (round <- 1 to maxIterV) {
      val nx = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => nx(v) = 0.0)
      edges.foreach { case (s, d, w) =>
        if (valid(s) && valid(d)) nx(d) += x(s) * w
      }
      x = nx
      // same overflow guard, SAME CADENCE (every 8th round, never the
      // last) — rescale timing changes float rounding, and parity holds
      // only if both paths follow an identical numeric trajectory
      if (round % 8 == 0 && round < maxIterV) {
        val m = vids.iterator.map(v => math.abs(x(v))).foldLeft(0.0)(math.max)
        if (m > 1e100) { val s = math.max(m, 1.0); vids.foreach(v => x(v) /= s) }
      }
    }
    val norm = vids.iterator.map(v => math.abs(x(v))).foldLeft(0.0)(math.max)
    LocalLinkAnalysis.joinBack(g, vids, Seq(
      ("eigenvector", (v: Any) => if (norm > 0) x(v) / norm else 0.0, 0.0)))
  }
}
