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

  /** Mixture sampling — the data-mixing primitive: keep a DIFFERENT
   * deterministic fraction per stratum (e.g. {web: 0.1, code: 0.8,
   * books: 1.0}) to hit a target training mixture in one filter pass.
   * Rows whose stratum has no entry in `fractions` are dropped (an
   * unlisted source is an excluded source — silent 100% passthrough of a
   * new source would skew the mixture unnoticed).
   *
   * The draw hashes (seed, stratum, id) exactly like
   * [[stratifiedHashSample]], so a stratum's kept set is stable when its
   * fraction grows: raising 0.1 → 0.2 only ADDS documents, which makes
   * mixture re-weighting incremental rather than a full resample. Pure
   * narrow filter — no shuffle, no broadcast, scan speed at any size. */
  def mixtureSample(df: DataFrame, idCol: String, strataCol: String,
      fractions: Map[String, Double], seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty, "mixtureSample: empty fraction map")
    fractions.foreach { case (k, f) =>
      require(f >= 0 && f <= 1, s"fraction for '$k' must be in [0,1]: $f") }
    val entries = fractions.toSeq.sortBy(_._1).flatMap { case (k, f) =>
      Seq(lit(k), lit(math.round(f * 65536.0).toInt)) }
    val thr = element_at(map(entries: _*), col(strataCol).cast("string"))
    // null threshold (unlisted stratum) compares to null -> row dropped
    df.filter(
      draw16(lit(seed), col(strataCol).cast("string"), col(idCol).cast("string"))
        < thr)
  }

  /** Pack documents into training shards of ~`budget` units (tokens,
   * bytes) by contiguous fill in `idCol` order (numeric, unique ids):
   * `shard_id = floor(prefix_sum_exclusive(size) / budget)`. Returns
   * (idCol, sizeCol, shard_id).
   *
   * The global running sum is computed as a DISTRIBUTED prefix sum:
   * bucket bounds come from ONE approx-quantile job and are embedded as
   * literals, so every row's bucket is a pure deterministic function of
   * its id — immune to recomputation (unlike `repartitionByRange`, whose
   * boundary sampling is seeded per plan execution and can assign
   * boundary rows differently across the two passes). Within-bucket
   * window cumsum + a driver-side prefix of the per-bucket totals (one
   * tiny collect, broadcast back) completes the sum. No single-partition
   * global window anywhere, so the operator holds at any corpus size,
   * and the output depends only on (data, budget) — bound PLACEMENT only
   * affects balance, never the result. */
  def packShards(df: DataFrame, idCol: String, sizeCol: String,
      budget: Long, numPartitions: Int = 0): DataFrame = {
    require(budget > 0, s"budget must be positive: $budget")
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"packShards orders by a numeric id column; got ${df.schema(idCol).dataType}")
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val parts =
      if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val probs = (1 until parts).map(_.toDouble / parts).toArray
    val bounds =
      if (probs.isEmpty) Array.empty[Double]
      else df.select(col(idCol).cast("double").as("_v"))
        .stat.approxQuantile("_v", probs, 0.01).distinct.sorted
    // bucket = number of bounds strictly below the id — nondecreasing in
    // id, so buckets partition the id order into contiguous runs
    val bucket =
      if (bounds.isEmpty) lit(0)
      else size(filter(typedlit(bounds.toSeq), b => b < col(idCol).cast("double")))
    val bucketed = df.select(col(idCol), col(sizeCol)).withColumn("_b", bucket)
    // per-bucket totals -> exclusive prefix offsets (tiny: one row per
    // bucket) — broadcast back instead of a global-order window
    val totals = bucketed.groupBy("_b")
      .agg(sum(col(sizeCol).cast("long")).as("_tot"))
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    if (totals.isEmpty)
      return df.select(col(idCol), col(sizeCol), lit(0L).as("shard_id")).limit(0)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) { case ((_, acc), (b, tot)) =>
      (b, acc + tot)
    }.sliding(2).collect { case Array((_, off), (b, _)) => (b, off) }.toSeq
    val offDF = broadcast(spark.createDataFrame(offsets).toDF("_b", "_off"))
    val within = sum(col(sizeCol).cast("long"))
      .over(Window.partitionBy("_b").orderBy(idCol))
    bucketed.withColumn("_cum", within)
      .join(offDF, "_b")
      .select(col(idCol), col(sizeCol),
        floor((col("_off") + col("_cum") - col(sizeCol)) / budget).as("shard_id"))
  }
}
