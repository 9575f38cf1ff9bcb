package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * k-clique listing (k = 3, 4) by ordered edge orientation — the
 * Chiba–Nishizeki / kClist enumeration discipline (Danisch et al.
 * WWW'18): orient every undirected edge from its lower to its higher
 * endpoint under the total order (degree, id), then enumerate cliques
 * as strictly ascending chains. Each clique materializes EXACTLY once
 * (no k!-fold duplicates to dedup), and every extension step is an
 * equi-join against the oriented edge set.
 *
 * Why the degree order matters at scale: out-degrees under it are
 * bounded by the graph's degeneracy (≪ max degree on power-law
 * graphs), so the candidate fan-out per vertex — the quadratic term in
 * clique listing — is bounded by the degeneracy, not by the hub
 * degree. A plain id order would give one hub an out-neighborhood of
 * millions and melt the wedge join; the (degree, id) order spreads
 * exactly that hub's wedges across its low-degree neighbors.
 *
 * Output rows are the clique's vertex ids sorted ASCENDING BY ID
 * (v1 < v2 < …) — the orientation is an internal execution detail and
 * never leaks into results.
 */
object Cliques {
  import GraphFrame.{SRC, DST}

  /** Canonical simple undirected edges (a < b), self-loops dropped. */
  private def canonical(g: GraphFrame): DataFrame =
    g.edges.select(col(SRC).as("a"), col(DST).as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("a"),
        greatest(col("a"), col("b")).as("b"))
      .distinct()

  /** Edges oriented by the (degree, id) total order:
   * (u, v, dv) with ord(u) < ord(v), where dv = degree(v) is carried so
   * later extension steps can compare ord without re-joining degrees. */
  private def oriented(e0: DataFrame): DataFrame = {
    val deg = e0.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("d"))
    e0.join(deg.select(col("v").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("d").as("db")), "b")
      .select(
        when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
          struct(col("a").as("u"), col("b").as("v"), col("db").as("dv")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"), col("da").as("dv")))
          .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"), col("e.dv").as("dv"))
  }

  /** Triangles as ordered chains u < v < w (ord order) with degrees
   * carried: (u, v, w, dv, dw). */
  private def orderedTriangles(e: DataFrame): DataFrame = {
    val wedges = e.select(col("u"), col("v"), col("dv"))
      .join(e.select(col("u"), col("v").as("w"), col("dv").as("dw")), "u")
      .filter(struct(col("dv"), col("v")) < struct(col("dw"), col("w")))
    wedges.join(e.select(col("u").as("v"), col("v").as("w")), Seq("v", "w"))
  }

  /** All triangles, one row each: (v1, v2, v3) ascending by id. */
  def triangles(g: GraphFrame): DataFrame = {
    // the oriented edge frame feeds three consumers (wedge sides +
    // membership check) — persist it, matching the engine's shared-frame
    // discipline (exchange reuse across aliases is not guaranteed);
    // release after consuming via [[graft.pipeline.releaseShared]]
    val e = oriented(canonical(g))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val t = orderedTriangles(e)
    val s = array_sort(array(col("u"), col("v"), col("w")))
    t.select(s.getItem(0).as("v1"), s.getItem(1).as("v2"), s.getItem(2).as("v3"))
  }

  /** All 4-cliques, one row each: (v1, v2, v3, v4) ascending by id.
   * Extension: every ordered triangle (u,v,w) meets candidates z with
   * ord(w) < ord(z) from u's out-neighborhood, verified against (v,z)
   * and (w,z) membership — two more equi-joins, no dedup pass. */
  def cliques4(g: GraphFrame): DataFrame = {
    // five consumers of the oriented frame (wedges ×2, three membership
    // checks) — persist once
    val e = oriented(canonical(g))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val tri = orderedTriangles(e)
    val cand = tri.join(e.select(col("u"), col("v").as("z"), col("dv").as("dz")), "u")
      .filter(struct(col("dw"), col("w")) < struct(col("dz"), col("z")))
    val quads = cand
      .join(e.select(col("u").as("v"), col("v").as("z")), Seq("v", "z"))
      .join(e.select(col("u").as("w"), col("v").as("z")), Seq("w", "z"))
    val s = array_sort(array(col("u"), col("v"), col("w"), col("z")))
    quads.select(s.getItem(0).as("v1"), s.getItem(1).as("v2"),
      s.getItem(2).as("v3"), s.getItem(3).as("v4"))
  }
}
