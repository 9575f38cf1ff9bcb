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

  /** Pack documents into training shards of ~`budget` units (tokens,
   * bytes) by contiguous fill in `idCol` order:
   * `shard_id = floor(prefix_sum_exclusive(size) / budget)`. Returns
   * (idCol, sizeCol, shard_id).
   *
   * The global running sum is computed as a DISTRIBUTED prefix sum —
   * range-partition by id, within-partition window cumsum, plus a
   * driver-side prefix of the per-partition totals (one tiny collect of
   * `numPartitions` longs) broadcast back. No single-partition global
   * window anywhere, so the operator holds at any corpus size, and the
   * output depends only on (data, budget), not on the partition count. */
  def packShards(df: DataFrame, idCol: String, sizeCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val ranged = df.select(col(idCol), col(sizeCol))
      .repartitionByRange(parts, col(idCol))
      .withColumn("_pid", spark_partition_id())
    // per-partition totals -> exclusive prefix offsets (tiny: one row per
    // partition) — broadcast back instead of a global-order window
    val totals = ranged.groupBy("_pid")
      .agg(sum(col(sizeCol).cast("long")).as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (totals.isEmpty)
      return df.select(col(idCol), col(sizeCol), lit(0L).as("shard_id")).limit(0)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) { case ((_, acc), (pid, tot)) =>
      (pid, acc + tot)
    }.sliding(2).collect { case Array((_, off), (pid, _)) => (pid, off) }.toSeq
    val offDF = broadcast(spark.createDataFrame(offsets).toDF("_pid", "_off"))
    val within = sum(col(sizeCol).cast("long"))
      .over(Window.partitionBy("_pid").orderBy(idCol))
    ranged.withColumn("_cum", within)
      .join(offDF, "_pid")
      .select(col(idCol), col(sizeCol),
        floor((col("_off") + col("_cum") - col(sizeCol)) / budget).as("shard_id"))
  }
}
