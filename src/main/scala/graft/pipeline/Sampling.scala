package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Deterministic sampling for training-data pipelines.
 *
 * All draws are md5-derived from row ids — no RNG state, stable under
 * task retries and AQE re-planning, reproducible by any engine with md5
 * (the classic hazard of `df.sample` at scale is resampling under
 * retries). Every operator is a narrow filter: no shuffle, runs at scan
 * speed, and composes with column pruning.
 */
object Sampling {

  /** 16-bit uniform draw in [0, 65536) from md5 of the key columns. */
  private def draw16(cols: Column*): Column =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 4), 16, 10).cast("int")

  /** Keep ~`fraction` of rows, selected by id hash: a row survives iff
   * draw(seed|id) < fraction·2^16. Deterministic per (seed, id). */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
      seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    val threshold = math.round(fraction * 65536.0).toInt
    df.filter(draw16(lit(seed), col(idCol).cast("string")) < lit(threshold))
  }

  /** Stratified variant: keep ~`fraction` of rows WITHIN each stratum
   * (e.g. language-balanced corpus downsampling). The draw hashes
   * (seed, stratum, id), so per-stratum samples are independent and a
   * stratum's sample is stable when other strata change. */
  def stratifiedHashSample(df: DataFrame, idCol: String, strataCol: String,
      fraction: Double, seed: Long = 42L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"fraction must be in [0,1]: $fraction")
    val threshold = math.round(fraction * 65536.0).toInt
    df.filter(
      draw16(lit(seed), col(strataCol).cast("string"), col(idCol).cast("string"))
        < lit(threshold))
  }
}
