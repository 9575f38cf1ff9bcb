package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Bipartite butterfly (2×2 biclique, i.e. 4-cycle) counting over an
 * edge table with a left and a right vertex column — the bipartite
 * analogue of triangle counting (motif cohesion for user–item /
 * supplier–part / doc–shingle graphs, after Sanei-Mehri et al. 2018,
 * "Butterfly Counting in Bipartite Networks").
 *
 * Spark-first shape: dedup the edge list, self-join on the PIVOT side
 * (the right column) to enumerate co-neighbor pairs of left vertices,
 * hash-aggregate the pair counts c, and sum C(c, 2) — every butterfly is
 * a pair of left vertices sharing two right neighbors, so
 * B = Σ_pairs C(c, 2) exactly, with no 4-cycle enumeration. All shuffles
 * are hash aggregations with map-side partials; the only fan-out is the
 * per-pivot wedge join, which is quadratic in the PIVOT side's degree.
 *
 * Scale: pass the lower-max-degree side as the pivot (for user–item
 * graphs, items are usually flatter than power-law users). A hub pivot
 * with degree d fans out d² wedge rows; `maxPivotDegree` caps that by
 * EXCLUDING over-cap pivot vertices (count becomes a documented lower
 * bound — the capped hubs are boilerplate-like near-complete connectors
 * with little motif signal, mirroring Dedup.ngramJaccard's stop-shingle
 * cap). The count stays exact while no pivot exceeds the cap.
 */
object Butterflies {

  /** Co-neighbor pairs of left vertices: (a, b, c) with a < b and
   * c = |N(a) ∩ N(b)| computed through the pivot join; the distinct
   * edge frame is persisted because it feeds both join sides (and the
   * left-vertex universe in [[perVertex]]). */
  private def copairs(edges: DataFrame, leftCol: String, rightCol: String,
      maxPivotDegree: Int): (DataFrame, DataFrame) = {
    val e = edges.select(col(leftCol).as("_l"), col(rightCol).as("_r"))
      .filter(col("_l").isNotNull && col("_r").isNotNull)
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val eJ = if (maxPivotDegree == Int.MaxValue) e else {
      val hot = e.groupBy("_r").agg(count(lit(1)).as("_d"))
        .filter(col("_d") > maxPivotDegree).select("_r")
      // anti-join (AQE broadcasts a small stop set on its own): over-cap
      // pivots are dropped from BOTH wedge sides
      e.join(hot, Seq("_r"), "left_anti")
    }
    val pairs = eJ.as("x").join(eJ.as("y"),
        col("x._r") === col("y._r") && col("x._l") < col("y._l"))
      .groupBy(col("x._l").as("a"), col("y._l").as("b"))
      .agg(count(lit(1)).as("c"))
    (e, pairs)
  }

  /** One-row global metrics: `n_butterflies` = Σ C(c,2) over co-neighbor
   * pairs, `n_wedges` = Σ c (left-vertex wedges through the pivot side),
   * `max_copair` = the largest co-neighbor overlap (the skew diagnostic
   * for picking `maxPivotDegree`). */
  def globalCounts(edges: DataFrame, leftCol: String, rightCol: String,
      maxPivotDegree: Int = Int.MaxValue): DataFrame = {
    val (_, pairs) = copairs(edges, leftCol, rightCol, maxPivotDegree)
    // `div`, not `/`: Long counts must never round-trip through Double
    pairs.agg(
      coalesce(sum(expr("c * (c - 1) div 2")), lit(0L)).cast("long").as("n_butterflies"),
      coalesce(sum(col("c")), lit(0L)).cast("long").as("n_wedges"),
      coalesce(max(col("c")), lit(0L)).cast("long").as("max_copair"))
  }

  /** Per-left-vertex butterfly support b(v) = Σ_{pairs ∋ v} C(c, 2)
   * (Σ_v b(v) = 2·B), zero-filled over every distinct left vertex.
   * Returns (id, butterflies). */
  def perVertex(edges: DataFrame, leftCol: String, rightCol: String,
      maxPivotDegree: Int = Int.MaxValue): DataFrame = {
    val (e, pairs) = copairs(edges, leftCol, rightCol, maxPivotDegree)
    val bf = expr("c * (c - 1) div 2").cast("long")
    val per = pairs.select(col("a").as("id"), bf.as("_b"))
      .unionByName(pairs.select(col("b").as("id"), bf.as("_b")))
      .groupBy("id").agg(sum(col("_b")).as("_bsum"))
    e.select(col("_l").as("id")).distinct()
      .join(per, Seq("id"), "left_outer")
      .select(col("id"), coalesce(col("_bsum"), lit(0L)).cast("long").as("butterflies"))
  }
}
