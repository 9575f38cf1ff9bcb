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
 * Raw magnitudes grow like (spectral radius)^rounds — far inside double
 * range for any realistic maxIter/degree (overflow needs
 * degree^maxIter > 1e308).
 *
 * Scale: each round is two hash-aggregated joins over the (pinned) edge
 * table — the same shuffle shape as a PageRank round, twice; vertex
 * state is (id, hub, authority) with rounds through the
 * [[IterationManager]].
 */
class Hits(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 10

  def maxIter(n: Int): this.type = { maxIterV = n; this }

  /** Returns vertices + `hub: double`, `authority: double` (L2-unit each). */
  def run(): DataFrame = {
    // pinned: re-joined every half-round, and possibly an expensive
    // upstream query (e.g. a multi-join edge derivation)
    val e = g.edges.select(col(SRC), col(DST)).persist()
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
}
