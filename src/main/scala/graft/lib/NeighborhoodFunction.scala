package graft.lib

import scala.collection.mutable.ArrayBuffer
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Neighborhood function + effective diameter (engine extension), the
 * HyperANF / ANF algorithm (Palmer et al. KDD'02; Boldi-Rosa-Vigna
 * WWW'11) on DataFrames with Spark's Datasketches theta sketches instead
 * of HyperLogLog counters: each vertex carries a sketch of its
 * distance-<=d reachability ball, and one superstep unions every vertex's
 * sketch with its out-neighbors' — `N(d) = Σ_v |ball_d(v)|` counts the
 * ordered pairs within distance d without ever materializing a pair.
 *
 * Why sketches: the exact per-vertex ball is O(V) per vertex — O(V²)
 * state that dies at scale; a theta sketch is a fixed <=2^lgNomEntries
 * bound per vertex, and below its nominal entry count it retains every
 * hash, so estimates are EXACT on small graphs (the same contract
 * [[TriangleCount.runApprox]] relies on — and why the driver query can be
 * hash-oracled against exact recursive-CTE pair counts).
 *
 * Scale: state is (id, sketch) — one row of bounded width per vertex;
 * each round is one edge join + one `theta_union_agg` hash aggregation
 * (map-side combinable: unions are associative), round count = graph
 * diameter, rounds through [[IterationManager]]. The per-round saturation
 * probe doubles as the convergence test.
 *
 * `run()` returns one row per distance: `(d: int, n_pairs: long)` for
 * d = 0 until N(d) stops growing (or `maxIter`). `effectiveDiameter`
 * post-processes that table.
 */
class NeighborhoodFunction(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 64
  private var lgNomEntriesV: Int = 12

  /** Distance cap (safety on adversarially deep graphs; the loop
   * normally exits at saturation = the graph's maximum eccentricity). */
  def maxIter(n: Int): this.type = {
    require(n > 0, "maxIter should be positive."); maxIterV = n; this
  }
  /** log2 nominal sketch entries: balls below 2^n count exactly; above,
   * within the theta sketch's relative-error envelope (~1/sqrt(2^n)). */
  def setLgNomEntries(n: Int): this.type = {
    require(n >= 4 && n <= 26, s"lgNomEntries out of [4, 26]: $n")
    lgNomEntriesV = n; this
  }

  def run(): DataFrame = {
    val spark = g.spark
    val lg = lgNomEntriesV
    val mgr = new IterationManager(2)
    val edges = mgr.persistLazy(
      g.edges.select(col(SRC), col(DST)).distinct().repartition(col(DST)))

    var state = mgr.cycle(g.vertices.select(col(ID))
      .groupBy(col(ID))
      .agg(expr(s"theta_sketch_agg($ID, $lg)").as("_nf_sk")), 0)

    // theta_sketch_estimate returns LONG (Spark rounds the raw estimate);
    // sum() over zero rows is NULL — coalesce so an empty vertex table
    // yields a clean (0, 0) row instead of an NPE
    def total(): Long =
      state.agg(coalesce(sum(expr("theta_sketch_estimate(_nf_sk)")), lit(0L)))
        .head().getLong(0)

    val counts = ArrayBuffer[(Int, Long)]((0, total()))
    var d = 0
    var saturated = false
    while (!saturated && d < maxIterV) {
      d += 1
      // ball_d(v) = ball_{d-1}(v) ∪ ⋃_{v→w} ball_{d-1}(w): ship each
      // vertex's sketch to its in-edges' sources, union per vertex
      val msgs = edges.join(state.withColumnRenamed(ID, DST), DST)
        .select(col(SRC).as(ID), col("_nf_sk"))
      state = mgr.cycle(state.unionByName(msgs)
        .groupBy(col(ID)).agg(expr(s"theta_union_agg(_nf_sk, $lg)").as("_nf_sk")), d)
      val nd = total()
      if (nd == counts.last._2) saturated = true else counts += ((d, nd))
    }
    mgr.close()
    import spark.implicits._
    counts.toSeq.toDF("d", "n_pairs")
  }

  /** Smallest d with N(d) >= alpha * N(max) — the standard (integer)
   * effective-diameter readout of the neighborhood function. */
  def effectiveDiameter(alpha: Double = 0.9): Double = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0, 1]: $alpha")
    val rows: Array[Row] = run().orderBy("d").collect()
    // run() always emits the d=0 row, but guard anyway: an empty graph's
    // neighborhood function is all-zero — report diameter 0, not a crash
    if (rows.isEmpty || rows.last.getLong(1) == 0L) return 0.0
    val nMax = rows.last.getLong(1)
    rows.find(_.getLong(1) >= alpha * nMax).map(_.getInt(0).toDouble).get
  }

  /** One-row effective-diameter report with the classic ANF linear
   * interpolation (Palmer–Gibbons–Faloutsos): at the smallest d₀ with
   * N(d₀) ≥ α·N(∞), `effective_diameter` = (d₀−1) + (α·N(∞) − N(d₀−1)) /
   * (N(d₀) − N(d₀−1)); plus the integer readout, the hop diameter, and
   * N(∞). Declarative finisher over the diameter-row [[run]] output (the
   * global window orders ≤ diameter+1 rows by construction), so a SQL
   * engine replays the identical float path. */
  def effectiveDiameterReport(alpha: Double = 0.9): DataFrame =
    effectiveDiameterReport(run(), alpha)

  /** Same readout over a PRECOMPUTED [[run]] table, so composed callers
   * (e.g. a neighborhood query plus a diameter readout in one report)
   * pay the HyperANF superstep loop once, not per readout. The
   * interpolated value is clamped at 0: when the d=0 row already
   * satisfies N(0) ≥ α·N(∞) (edgeless graph), the raw formula yields
   * (0−1)+α — negative — where the classic ANF readout floors at 0. */
  def effectiveDiameterReport(nf: DataFrame, alpha: Double): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha out of (0, 1]: $alpha")
    val tot = nf.agg(max(col("n_pairs")).as("_tot"), max(col("d")).as("_diam"))
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("d"))
    nf.crossJoin(tot)
      .withColumn("_prev", coalesce(lag(col("n_pairs"), 1).over(w), lit(0L)))
      .filter(col("n_pairs") >= col("_tot") * alpha)
      .orderBy(col("d")).limit(1)
      .select(
        greatest(lit(0.0), (col("d") - 1) + (col("_tot") * alpha - col("_prev")) /
          (col("n_pairs") - col("_prev"))).as("effective_diameter"),
        col("d").as("effective_diameter_int"),
        col("_diam").as("diameter"),
        col("_tot").as("n_pairs_total"))
  }
}
