package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Deterministic synthetic graph generators for benchmarking and scale
 * tests (the R-MAT recursive-matrix model of Chakrabarti–Zhan–Faloutsos,
 * SDM'04 — the generator behind Graph500). No RNG state anywhere: every
 * quadrant decision is an md5 draw keyed by (seed, edge, level), so the
 * SAME graph materializes on any cluster, any partitioning, any retry —
 * and an external SQL engine replays it bit-identically.
 *
 * Shape: one `spark.range(numEdges)` projection — per edge, `scale`
 * md5 draws fold into the src/dst bit patterns entirely inside
 * whole-stage codegen. Nothing shuffles; generation throughput scales
 * linearly with executors, which is the point of a 100 TB-scale test
 * harness. Skew is the MODEL's (pA-heavy quadrants produce the
 * power-law hubs real graphs have) — exactly what skew-handling tests
 * want as input.
 */
object GraphGenerators {

  /** Quadrant thresholds as exact 60-bit integers: draw < ta → (0,0),
   * < tab → (0,1), < tabc → (1,0), else (1,1). Exposed so a SQL replay
   * can embed the identical Long literals. */
  def rmatThresholds(pA: Double, pB: Double, pC: Double): (Long, Long, Long) = {
    require(pA > 0 && pB > 0 && pC > 0 && pA + pB + pC < 1,
      s"R-MAT probabilities must be positive with pA+pB+pC < 1: $pA $pB $pC")
    val m = (1L << 60).toDouble
    ((pA * m).toLong, ((pA + pB) * m).toLong, ((pA + pB + pC) * m).toLong)
  }

  /** `numEdges` R-MAT edges over 2^`scale` vertices:
   * (edge_id, src, dst). Self-loops and duplicates are kept (the raw
   * model); dedup/canonicalize downstream as the test requires. */
  def rmat(spark: SparkSession, scale: Int, numEdges: Long, seed: Int = 42,
      pA: Double = 0.57, pB: Double = 0.19, pC: Double = 0.19): DataFrame = {
    require(scale >= 1 && scale <= 40, s"scale out of [1, 40]: $scale")
    require(numEdges >= 1, s"numEdges must be >= 1: $numEdges")
    val (ta, tab, tabc) = rmatThresholds(pA, pB, pC)
    val draws = (0 until scale).map { l =>
      conv(substring(md5(concat_ws("|", lit(seed), col("id"), lit(l))), 1, 15),
        16, 10).cast("long")
    }
    val srcBits = draws.zipWithIndex.map { case (d, l) =>
      when(d >= tab, lit(1L << (scale - 1 - l))).otherwise(0L)
    }.reduce(_ + _)
    val dstBits = draws.zipWithIndex.map { case (d, l) =>
      when((d >= ta && d < tab) || d >= tabc,
        lit(1L << (scale - 1 - l))).otherwise(0L)
    }.reduce(_ + _)
    spark.range(numEdges)
      .select(col("id").as("edge_id"), srcBits.as("src"), dstBits.as("dst"))
  }
}
