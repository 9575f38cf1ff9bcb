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
    val mgr = new IterationManager(2)
    var state = mgr.cycle(
      g.vertices.select(col(ID), lit(1.0).as("hub"), lit(1.0).as("authority")), 0)

    for (round <- 1 to maxIterV) {
      // authority(v) = Σ hub(u) over edges u→v (0 for no inlinks)
      val authRaw = e.join(state.select(col(ID).as(SRC), col("hub")), SRC)
        .groupBy(col(DST).as(ID)).agg(sum("hub").as("_a"))
      val authed = state.select(col(ID), col("hub"))
        .join(authRaw, Seq(ID), "left_outer")
        .select(col(ID), col("hub"),
          coalesce(col("_a"), lit(0.0)).as("authority"))
      // hub(u) = Σ authority(v) over edges u→v, against the NEW authority
      val hubRaw = e.join(authed.select(col(ID).as(DST), col("authority")), DST)
        .groupBy(col(SRC).as(ID)).agg(sum("authority").as("_h"))
      state = mgr.cycle(authed.select(col(ID), col("authority"))
        .join(hubRaw, Seq(ID), "left_outer")
        .select(col(ID), coalesce(col("_h"), lit(0.0)).as("hub"),
          col("authority")), round)
      // Overflow guard: raw sums grow like (spectral radius)^round, and
      // maxIter is user-settable (Connect/Python) with no bound — e.g. a
      // 1e8-degree hub at maxIter 40 would hit Infinity and turn the final
      // normalization into all-NaN. Every 8 rounds (round 8 is a cut round
      // for any interval dividing 8, so the agg reads the fresh cache), if
      // magnitudes left the comfortable range, divide both columns by
      // their max — a pure projection the next cycle persists,
      // direction-preserving, so the final normalization is unchanged.
      // Between checks a jump from 1e100 to 1e308 would need a per-round
      // growth factor above 1e26 ~ degree^2, i.e. a 1e13-degree vertex —
      // beyond any real edge count.
      if (round % 8 == 0 && round < maxIterV) {
        val m = state.agg(max(abs(col("hub"))).as("h"),
          max(abs(col("authority"))).as("a")).head()
        if (!m.isNullAt(0) && !m.isNullAt(1)) {
          val (mh, ma) = (m.getDouble(0), m.getDouble(1))
          if (mh > 1e100 || ma > 1e100)
            state = state.select(col(ID),
              (col("hub") / lit(math.max(mh, 1.0))).as("hub"),
              (col("authority") / lit(math.max(ma, 1.0))).as("authority"))
        }
      }
    }

    val norms = state.agg(
      sum(col("hub") * col("hub")).as("h2"),
      sum(col("authority") * col("authority")).as("a2")).head()
    val hNorm = math.sqrt(norms.getDouble(0))
    val aNorm = math.sqrt(norms.getDouble(1))
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
