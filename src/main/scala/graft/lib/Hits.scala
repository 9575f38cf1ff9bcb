package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * HITS — Kleinberg's hubs-and-authorities power iteration (beyond the
 * reference's library; the natural companion of PageRank for directed
 * link analysis). Per round: authority = Σ of in-neighbor hub scores,
 * L2-normalized; then hub = Σ of out-neighbor NEW authority scores,
 * L2-normalized.
 *
 * Scale: each round is two hash-aggregated joins over the edge table
 * (the same shuffle shape as one PageRank round, twice) plus two scalar
 * norm aggregations; vertex state is (id, hub, auth) and rounds go
 * through the [[IterationManager]] so the plan stays flat. The norms are
 * driver-collected scalars embedded as literals — deterministic and
 * replayable by an unrolled SQL oracle.
 */
class Hits(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 10

  def maxIter(n: Int): this.type = { maxIterV = n; this }

  /** Returns vertices + `hub: double`, `authority: double`. */
  def run(): DataFrame = {
    val e = g.edges.select(col(SRC), col(DST))
    val mgr = new IterationManager(2)
    var state = mgr.cycle(
      g.vertices.select(col(ID), lit(1.0).as("hub"), lit(1.0).as("authority")), 0)

    var round = 1
    for (_ <- 1 to maxIterV) {
      // authority(v) = Σ hub(u) over edges u→v (0 for no inlinks)
      val authRaw = e.join(state.select(col(ID).as(SRC), col("hub")), SRC)
        .groupBy(col(DST).as(ID)).agg(sum("hub").as("_a"))
      val withAuth = state.select(col(ID), col("hub"))
        .join(authRaw, Seq(ID), "left_outer")
        .select(col(ID), col("hub"), coalesce(col("_a"), lit(0.0)).as("_a"))
      val aNorm = math.sqrt(
        withAuth.agg(sum(col("_a") * col("_a"))).head().getDouble(0))
      val authed = withAuth.select(col(ID), col("hub"),
        (if (aNorm > 0) col("_a") / aNorm else lit(0.0)).as("authority"))

      // hub(u) = Σ authority(v) over edges u→v, against the NEW authority
      val hubRaw = e.join(authed.select(col(ID).as(DST), col("authority")), DST)
        .groupBy(col(SRC).as(ID)).agg(sum("authority").as("_h"))
      val withHub = authed.select(col(ID), col("authority"))
        .join(hubRaw, Seq(ID), "left_outer")
        .select(col(ID), coalesce(col("_h"), lit(0.0)).as("_h"), col("authority"))
      val hNorm = math.sqrt(
        withHub.agg(sum(col("_h") * col("_h"))).head().getDouble(0))
      state = mgr.cycle(withHub.select(col(ID),
        (if (hNorm > 0) col("_h") / hNorm else lit(0.0)).as("hub"),
        col("authority")), round)
      round += 1
    }
    mgr.finish(g.vertices.join(
      state.select(col(ID), col("hub"), col("authority")), Seq(ID), "left_outer"))
  }
}
