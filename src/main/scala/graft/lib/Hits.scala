package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * HITS — Kleinberg's hubs-and-authorities power iteration (beyond the
 * reference's library; the natural companion of PageRank for directed
 * link analysis). Per round: authority = Σ of in-neighbor hub scores,
 * then hub = Σ of out-neighbor NEW authority scores.
 *
 * Per-round L2 normalization only rescales the vectors (the direction is
 * unchanged — each round is a positive-scalar multiple of the normalized
 * recurrence), so this implementation iterates RAW sums lazily and
 * normalizes ONCE at the end: the whole loop runs one materializing job
 * per lineage-cut window instead of two norm-collect jobs per round.
 * Raw magnitudes grow like (spectral radius)^rounds; an in-loop guard
 * rescales both columns by their max whenever they pass 1e100 (checked
 * every 8 rounds — see the inline math), so unbounded user maxIter
 * cannot overflow into all-NaN output.
 *
 * Scale: each round is two hash-aggregated joins over the (pinned) edge
 * table — the same shuffle shape as a PageRank round, twice; vertex
 * state is (id, hub, authority) with rounds through the
 * [[IterationManager]].
 */
class Hits(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 10
  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)

  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Rounds chained lazily per lineage cut (default 2; ≤ 8) — see
   * [[Eigenvector.roundsPerCycle]] for the cost model. Chunks clamp at
   * the every-8th-round overflow-guard boundary, so the guard cadence
   * (and local==distributed float parity) is unchanged at any k. */
  def roundsPerCycle(k: Int): this.type = {
    require(k >= 1 && k <= 8, s"roundsPerCycle out of [1, 8]: $k")
    roundsPerCycleV = k; this
  }
  private var roundsPerCycleV: Int = 2
  /** EDGE-count threshold below which the power iteration finishes in one
   * bounded driver loop instead of per-round distributed supersteps (same
   * pattern as ConnectedComponents' union-find tail; 0 disables). Driver
   * cost at the 100k default: one ~2x32-byte-per-edge collect plus
   * O(maxIter x edges) float adds — microseconds where the superstep path
   * pays ~0.4 s of scheduling per lineage-cut job (measured 3.2 s → 1.5 s
   * on the 25-vertex nations graph). At scale the probe count doubles as
   * the cache warm the distributed rounds need anyway.
   * Full bounded-path matrix: docs/THRESHOLDS.md. */
  def setSmallGraphThreshold(n: Long): this.type = { smallGraphThresholdV = n; this }

  /** Returns vertices + `hub: double`, `authority: double` (L2-unit each). */
  def run(): DataFrame = {
    // pinned: re-joined every half-round, and possibly an expensive
    // upstream query (e.g. a multi-join edge derivation)
    val e = g.edges.select(col(SRC), col(DST)).persist()
    // maxIter=0 normalizes the all-ones init over ALL vertices, which the
    // endpoints-only local loop cannot see — distributed handles it
    if (smallGraphThresholdV > 0 && maxIterV >= 1 &&
        e.count() <= smallGraphThresholdV) {
      val r = runLocal(e)
      e.unpersist(false)
      return r
    }
    // interval 1: each chunk of roundsPerCycle lazily-chained rounds is
    // one cut, with the guard maxes and the final L2 norms fused into the
    // cut's own job via cycleObserved — zero separate loop actions
    val mgr = new IterationManager(1)
    var state = mgr.cycle(
      g.vertices.select(col(ID), lit(1.0).as("hub"), lit(1.0).as("authority")), 0)

    var round = 0
    var cycleIdx = 0
    var finalNorms: Option[(Double, Double)] = None
    def dbl(a: Any): Double = a match {
      case d: java.lang.Double => d.doubleValue()
      case _ => 0.0
    }
    while (round < maxIterV) {
      cycleIdx += 1
      // clamp at the guard boundary — the every-8th-round check must read
      // a materialized frame and its timing is part of the float contract
      val k = math.min(roundsPerCycleV,
        math.min(maxIterV, ((round / 8) + 1) * 8) - round)
      var cur = state
      for (_ <- 1 to k) {
        // authority(v) = Σ hub(u) over edges u→v (0 for no inlinks)
        val authRaw = e.join(cur.select(col(ID).as(SRC), col("hub")), SRC)
          .groupBy(col(DST).as(ID)).agg(sum("hub").as("_a"))
        val authed = cur.select(col(ID), col("hub"))
          .join(authRaw, Seq(ID), "left_outer")
          .select(col(ID), col("hub"),
            coalesce(col("_a"), lit(0.0)).as("authority"))
        // hub(u) = Σ authority(v) over edges u→v, against the NEW authority
        val hubRaw = e.join(authed.select(col(ID).as(DST), col("authority")), DST)
          .groupBy(col(SRC).as(ID)).agg(sum("authority").as("_h"))
        cur = authed.select(col(ID), col("authority"))
          .join(hubRaw, Seq(ID), "left_outer")
          .select(col(ID), coalesce(col("_h"), lit(0.0)).as("hub"),
            col("authority"))
      }
      round += k
      if (round >= maxIterV) {
        // last chunk: fuse the L2 norms the output normalization needs
        val (next, obs) = mgr.cycleObserved(cur, cycleIdx, Seq(
          sum(col("hub") * col("hub")), sum(col("authority") * col("authority"))))
        state = next
        finalNorms = Some((math.sqrt(dbl(obs(0))), math.sqrt(dbl(obs(1)))))
      } else if (round % 8 == 0) {
        // Overflow guard: raw sums grow like (spectral radius)^round, and
        // maxIter is user-settable (Connect/Python) with no bound — e.g. a
        // 1e8-degree hub at maxIter 40 would hit Infinity and turn the
        // final normalization into all-NaN. Every 8 rounds, if magnitudes
        // left the comfortable range, divide both columns by their max — a
        // pure projection the next chunk builds on, direction-preserving,
        // so the final normalization is unchanged. Between checks a jump
        // from 1e100 to 1e308 would need a per-round growth factor above
        // 1e26 ~ degree^2, i.e. a 1e13-degree vertex — beyond any real
        // edge count. The maxes ride the chunk cut's own job (observe).
        val (next, obs) = mgr.cycleObserved(cur, cycleIdx, Seq(
          max(abs(col("hub"))), max(abs(col("authority")))))
        val (mh, ma) = (dbl(obs(0)), dbl(obs(1)))
        state =
          if (mh > 1e100 || ma > 1e100)
            next.select(col(ID),
              (col("hub") / lit(math.max(mh, 1.0))).as("hub"),
              (col("authority") / lit(math.max(ma, 1.0))).as("authority"))
          else next
      } else state = mgr.cycle(cur, cycleIdx)
    }

    // maxIter = 0 skips the loop: normalize the all-ones init directly
    val (hNorm, aNorm) = finalNorms.getOrElse {
      val norms = state.agg(
        sum(col("hub") * col("hub")).as("h2"),
        sum(col("authority") * col("authority")).as("a2")).head()
      (math.sqrt(norms.getDouble(0)), math.sqrt(norms.getDouble(1)))
    }
    val result = mgr.finish(g.vertices.join(
      state.select(col(ID),
        (if (hNorm > 0) col("hub") / hNorm else lit(0.0)).as("hub"),
        (if (aNorm > 0) col("authority") / aNorm else lit(0.0)).as("authority")),
      Seq(ID), "left_outer"))
    e.unpersist(false)
    result
  }

  /** Driver-side tail: identical recurrence (raw sums, one final L2
   * normalization), sorted-edge accumulation order so the result is a pure
   * function of the graph value. Vertices touching no edge score 0 from
   * round 1 on — filled in closed form by the join-back. */
  private def runLocal(e: DataFrame): DataFrame = {
    import scala.collection.mutable
    val (edges, vids) = LocalLinkAnalysis.collectGraph(e, g)
    val valid = vids.toSet
    var hub = mutable.HashMap.empty[Any, Double]
    var auth = mutable.HashMap.empty[Any, Double]
    vids.foreach { v => hub(v) = 1.0; auth(v) = 1.0 }
    for (round <- 1 to maxIterV) {
      val a = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => a(v) = 0.0)
      edges.foreach { case (s, d) =>
        if (valid(s) && valid(d)) a(d) += hub(s)
      }
      val h = mutable.HashMap.empty[Any, Double]
      vids.foreach(v => h(v) = 0.0)
      edges.foreach { case (s, d) =>
        if (valid(s) && valid(d)) h(s) += a(d)
      }
      hub = h; auth = a
      // same overflow guard as the distributed path — SAME CADENCE too
      // (every 8th round, never the last): rescale timing changes float
      // rounding, and local==distributed parity holds only if both paths
      // follow an identical numeric trajectory on graphs whose raw sums
      // cross 1e100
      if (round % 8 == 0 && round < maxIterV) {
        val mh = vids.iterator.map(v => math.abs(hub(v))).foldLeft(0.0)(math.max)
        val ma = vids.iterator.map(v => math.abs(auth(v))).foldLeft(0.0)(math.max)
        if (mh > 1e100 || ma > 1e100) {
          val (sh, sa) = (math.max(mh, 1.0), math.max(ma, 1.0))
          vids.foreach { v => hub(v) /= sh; auth(v) /= sa }
        }
      }
    }
    val hNorm = math.sqrt(vids.iterator.map(v => hub(v) * hub(v)).sum)
    val aNorm = math.sqrt(vids.iterator.map(v => auth(v) * auth(v)).sum)
    LocalLinkAnalysis.joinBack(g, vids, Seq(
      ("hub", (v: Any) => if (hNorm > 0) hub(v) / hNorm else 0.0, 0.0),
      ("authority", (v: Any) => if (aNorm > 0) auth(v) / aNorm else 0.0, 0.0)))
  }
}
