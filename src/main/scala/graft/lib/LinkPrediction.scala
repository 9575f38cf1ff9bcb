package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Link-prediction scores (engine extension): for every NON-adjacent
 * vertex pair at distance 2 on the undirected simple graph, the four
 * classic neighborhood heuristics (Liben-Nowell & Kleinberg, CIKM'03) —
 * common neighbors, Jaccard, Adamic-Adar, preferential attachment.
 *
 * Execution: one wedge self-join of the doubled edge list (center w
 * joins its neighbor pairs u < v) feeds a single hash aggregation that
 * computes common-neighbor counts AND the Adamic-Adar sum together —
 * every wedge center has degree >= 2, so 1/ln(deg) is always finite;
 * candidates already adjacent leave via one anti-join, and the degree
 * joins finish Jaccard / preferential attachment. No neighbor arrays,
 * no per-pair set intersection: the whole operator is three shuffles
 * (doubled-list agg, wedge agg, degree join).
 *
 * Scale: wedge rows are Σ_w deg(w)² — the quadratic hub hazard every
 * wedge enumeration has. [[setMaxHubDegree]] drops wedge CENTERS above
 * the cap (hub centers contribute ~0 Adamic-Adar weight and connect
 * near-everything; the same escape hatch as bipartiteProjection's hub
 * cap — docs/THRESHOLDS.md applies; 0 disables).
 *
 * Returns `(src, dst, cn, jaccard, adamic_adar, pref_attach)`,
 * canonical src < dst.
 */
class LinkPrediction(g: GraphFrame) {
  import GraphFrame.{SRC, DST}

  private var maxHubDegreeV: Long = 0L

  /** Drop wedge centers with degree above this cap (0 = off). */
  def setMaxHubDegree(n: Long): this.type = {
    require(n >= 0, s"maxHubDegree must be >= 0: $n"); maxHubDegreeV = n; this
  }

  def run(): DataFrame = {
    val canon = g.edges
      .filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
      .distinct()
      .persist()
    val doubled = canon.select(col(SRC).as("_lp_w"), col(DST).as("_lp_n"))
      .unionAll(canon.select(col(DST).as("_lp_w"), col(SRC).as("_lp_n")))
    val deg = doubled.groupBy(col("_lp_w").as("_lp_id"))
      .agg(count(lit(1)).as("_lp_deg"))
    val centers =
      if (maxHubDegreeV > 0)
        doubled.join(deg.filter(col("_lp_deg") <= maxHubDegreeV)
          .select(col("_lp_id").as("_lp_w"), col("_lp_deg")), "_lp_w")
      else doubled.join(deg.select(col("_lp_id").as("_lp_w"), col("_lp_deg")), "_lp_w")

    // wedges u - w - v with u < v; one agg computes CN and Adamic-Adar
    val x = centers.select(col("_lp_w"), col("_lp_n").as("_lp_u"), col("_lp_deg"))
    val y = centers.select(col("_lp_w"), col("_lp_n").as("_lp_v"))
    val cand = x.join(y, Seq("_lp_w"))
      .filter(col("_lp_u") < col("_lp_v"))
      .groupBy(col("_lp_u").as(SRC), col("_lp_v").as(DST))
      .agg(count(lit(1)).as("cn"),
        sum(lit(1.0) / log(col("_lp_deg"))).as("adamic_adar"))
      .join(canon, Seq(SRC, DST), "left_anti")

    val du = deg.select(col("_lp_id").as(SRC), col("_lp_deg").as("_lp_du"))
    val dv = deg.select(col("_lp_id").as(DST), col("_lp_deg").as("_lp_dv"))
    val out = cand.join(du, SRC).join(dv, DST)
      .select(col(SRC), col(DST), col("cn"),
        (col("cn") / (col("_lp_du") + col("_lp_dv") - col("cn"))).as("jaccard"),
        col("adamic_adar"),
        (col("_lp_du") * col("_lp_dv")).as("pref_attach"))
      .localCheckpoint(true)
    canon.unpersist(false)
    out
  }
}
