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

  /** Deterministic train/val/test split assignment: each row draws the
   * 16-bit md5 fraction of (seed, id) and lands in the split whose
   * cumulative threshold range covers it. The assignment is a pure
   * function of (seed, id) — stable across runs, engines, partitionings
   * AND corpus growth (adding rows never moves an existing row between
   * splits, the property date-ordered or modulo-count splits lack).
   * Fractions must sum to 1; cumulative ranges are taken in split-NAME
   * order and the last range absorbs the ≤ #splits rounding ulps of the
   * 2^16 grid. Returns the input plus a `split` column. */
  def hashSplit(df: DataFrame, idCol: String, fractions: Map[String, Double],
      seed: Long = 42L): DataFrame = {
    require(fractions.nonEmpty, "hashSplit: empty fraction map")
    fractions.foreach { case (k, f) =>
      require(f >= 0 && f <= 1, s"fraction for '$k' must be in [0,1]: $f") }
    val total = fractions.values.sum
    require(math.abs(total - 1.0) < 1e-9,
      s"hashSplit fractions must sum to 1 (a SPLIT covers every row — " +
        s"use hashSample/mixtureSample to subsample): $total")
    val cum = fractions.toSeq.sortBy(_._1)
      .scanLeft(("", 0L)) { case ((_, acc), (k, f)) =>
        (k, acc + math.round(f * 65536.0)) }.drop(1)
    val d = draw16(lit(seed), col(idCol).cast("string"))
    val lastKey = cum.last._1
    val splitCol = cum.init.foldLeft(Option.empty[Column]) {
      case (acc, (k, c)) =>
        Some(acc.map(_.when(d < c, lit(k))).getOrElse(when(d < c, lit(k))))
    }.map(_.otherwise(lit(lastKey))).getOrElse(lit(lastKey))
    df.withColumn("split", splitCol)
  }

  /** Deterministic corpus shuffle into training shards — the global
   * pre-training shuffle without a global sort: `shard` = 60-bit
   * md5(seed|id) fraction mod `numShards`, `pos` = rank within the shard
   * by (draw, id). A pure function of (seed, id): re-runs, engines and
   * partitionings agree bit-for-bit (the draw IS the shuffle order, so
   * there is no RNG state to replay). Shard sizes concentrate at
   * N/numShards by the hash, so the per-shard window sort is the bounded
   * unit of work at any corpus size — `numShards` is the parallelism
   * knob (size it so a shard's rows sort in one task, the same envelope
   * as [[budgetSelect]]'s groups). Returns (idCol, shard, pos). */
  def shuffleShards(df: DataFrame, idCol: String, numShards: Int,
      seed: Long = 42L): DataFrame = {
    require(numShards >= 1 && numShards <= (1 << 20),
      s"numShards out of [1, ${1 << 20}]: $numShards")
    val h = conv(substring(md5(concat_ws("|", lit(seed),
      col(idCol).cast("string"))), 1, 15), 16, 10).cast("long")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("_h"), col(idCol))
    df.select(col(idCol), h.as("_h"))
      .withColumn("shard", pmod(col("_h"), lit(numShards.toLong)).cast("int"))
      .withColumn("pos", (row_number().over(w) - 1).cast("long"))
      .drop("_h")
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
    exclusivePrefixSum(df, idCol, sizeCol, numPartitions, "packShards")
      .select(col(idCol), col(sizeCol),
        floor(col("_off_excl") / budget).as("shard_id"))
  }

  /** DISTRIBUTED exclusive prefix sum of `sizeCol` in `idCol` order —
   * the shared engine under [[packShards]] and [[packContextWindows]]:
   * (idCol, sizeCol, _off_excl). Bucket bounds come from ONE
   * approx-quantile job and are embedded as literals, so every row's
   * bucket is a pure deterministic function of its id — immune to
   * recomputation (unlike `repartitionByRange`, whose boundary sampling
   * is seeded per plan execution and can assign boundary rows
   * differently across the two passes). Within-bucket window cumsum + a
   * driver-side prefix of the per-bucket totals (one tiny collect,
   * broadcast back) completes the sum. No single-partition global window
   * anywhere, so it holds at any corpus size, and the output depends
   * only on the data — bound PLACEMENT only affects balance, never the
   * result. */
  private[graft] def exclusivePrefixSum(df: DataFrame, idCol: String,
      sizeCol: String, numPartitions: Int, op: String): DataFrame = {
    require(df.schema(idCol).dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"$op orders by a numeric id column; got ${df.schema(idCol).dataType}")
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
      return df.select(col(idCol), col(sizeCol), lit(0L).as("_off_excl")).limit(0)
    val offsets = totals.scanLeft((Int.MinValue, 0L)) { case ((_, acc), (b, tot)) =>
      (b, acc + tot)
    }.sliding(2).collect { case Array((_, off), (b, _)) => (b, off) }.toSeq
    val offDF = broadcast(spark.createDataFrame(offsets).toDF("_b", "_off"))
    val within = sum(col(sizeCol).cast("long"))
      .over(Window.partitionBy("_b").orderBy(idCol))
    bucketed.withColumn("_cum", within)
      .join(offDF, "_b")
      .select(col(idCol), col(sizeCol),
        (col("_off") + col("_cum") - col(sizeCol)).as("_off_excl"))
  }

  /** GPT-style concat-and-chunk CONTEXT-WINDOW PACKING: lay every
   * document's tokens end-to-end in `idCol` order (numeric, unique ids)
   * and cut the stream into fixed `window`-token training sequences —
   * documents crossing a boundary are SPLIT, so every window is exactly
   * full except the last (the standard pretraining packing; contrast
   * [[packShards]], which keeps documents whole and packs to ~budget).
   * Returns one row per (document × window it touches):
   * (idCol, sizeCol, window_id, start_tok — 0-based offset INSIDE the
   * document, n_tok), with Σ n_tok = sizeCol per document and
   * Σ n_tok = window (except the final window) per window_id.
   *
   * Scale: the global token offset is the same distributed prefix sum
   * as [[packShards]] (quantile buckets + broadcast bucket offsets — no
   * global-order window); the crossing rows come from one `sequence` +
   * `explode` whose fan-out per document is ⌈size/window⌉+1, i.e.
   * proportional to the OUTPUT. Zero-token documents emit nothing. */
  def packContextWindows(df: DataFrame, idCol: String, sizeCol: String,
      window: Long, numPartitions: Int = 0): DataFrame = {
    require(window > 0, s"window must be positive: $window")
    exclusivePrefixSum(df, idCol, sizeCol, numPartitions, "packContextWindows")
      .filter(col(sizeCol) > 0)
      .withColumn("window_id",
        explode(sequence(floor(col("_off_excl") / window),
          floor((col("_off_excl") + col(sizeCol) - 1) / window))))
      .select(col(idCol), col(sizeCol), col("window_id"),
        (greatest(col("window_id") * window, col("_off_excl"))
          - col("_off_excl")).as("start_tok"),
        (least((col("window_id") + 1) * window, col("_off_excl") + col(sizeCol))
          - greatest(col("window_id") * window, col("_off_excl"))).as("n_tok"))
  }

  /** Importance resampling (the DSIR recipe, Xie et al. arXiv:2302.03169:
   * resample proportionally to an importance weight — quality score,
   * LM perplexity ratio, domain match): each row survives with
   * probability `min(1, k · w)`, where `k` is the waterfilling constant
   * making the expected kept count equal `targetFraction · N`. A naive
   * `k = tf·N/Σw` silently under-delivers on heavy-tailed weights (mass
   * clipped at probability 1 is lost), so `k` is refined by clip-
   * renormalization rounds — rows already at probability 1 are set
   * aside and the remaining budget re-spread over the rest; the clipped
   * set grows monotonically, and two rounds settle it for all but
   * pathological weight ladders (each round is one tiny aggregate job).
   * The acceptance draw is the same md5 hash the plain samplers use —
   * deterministic per (seed, id), retry/AQE-safe, SQL-replayable; the
   * filter itself is a narrow scan-speed pass. Weights must be
   * non-negative; an all-zero corpus keeps nothing. */
  def importanceSample(df: DataFrame, idCol: String, weightCol: String,
      targetFraction: Double, seed: Long = 42L, renormRounds: Int = 2): DataFrame = {
    require(targetFraction >= 0 && targetFraction <= 1,
      s"targetFraction must be in [0,1]: $targetFraction")
    val w = col(weightCol).cast("double")
    val row = df.agg(sum(w).as("z"), count(lit(1)).as("n"), min(w).as("mn")).head()
    if (row.isNullAt(0) || row.getDouble(0) == 0.0)
      return df.limit(0)
    require(row.getDouble(2) >= 0.0,
      s"importanceSample: negative weight in '$weightCol'")
    val target = targetFraction * row.getLong(1)
    // (tf * N) / Z evaluated in this exact association so a SQL replay
    // using the same expressions reproduces every double bit-for-bit
    var k = target / row.getDouble(0)
    for (_ <- 1 to renormRounds) {
      // rows clipped at probability 1 consume one unit each; re-spread
      // the remaining budget over the unclipped mass
      val r = df.agg(
        sum(when(w * k >= 1.0, 1.0).otherwise(0.0)).as("c"),
        sum(when(w * k >= 1.0, 0.0).otherwise(w)).as("zu")).head()
      val clipped = r.getDouble(0)
      val zu = r.getDouble(1)
      if (zu > 0.0 && target > clipped) k = (target - clipped) / zu
    }
    df.filter(draw16(lit(seed), col(idCol).cast("string")) <
      least(lit(1.0), lit(k) * w) * 65536.0)
  }

  /** Deterministic per-group sample: the k rows per group with the
   * smallest md5(seed|id) hex draw (ties broken by id) — "give me k docs
   * per source" with no RNG state, stable under re-runs, retries and any
   * partitioning. One shuffle on the group key + an in-partition
   * row_number; no global sort. Fractions vary by group size — for a
   * fixed RATE per stratum use [[stratifiedHashSample]] instead. */
  /** Token-budget corpus selection — the data-mixing cut after scoring:
   * within each group (language / domain), rank rows by
   * (`scoreCol` desc, `idCol` asc) and keep the PREFIX whose cumulative
   * `tokenCol` stays within `budgetPerGroup` (the running sum includes
   * the current row, so the first over-budget row and everything ranked
   * below it are cut). Prefix-cut, not skip-and-continue: the sequential
   * knapsack variant that skips a too-big document and keeps filling is
   * inherently serial, while the prefix rule is one window pass and is
   * the standard large-scale approximation. Returns the kept rows as
   * (idCol, groupCol, tokenCol, rank, cum_tokens).
   *
   * Scale shape: one window partitioned by group — groups are languages
   * or domains (dozens to thousands), and each group's rows sort within
   * one partition; for a group too hot to sort in one task, sub-bucket
   * upstream or raise executor memory (same envelope as [[groupSample]]).
   */
  def budgetSelect(df: DataFrame, idCol: String, groupCol: String,
      tokenCol: String, scoreCol: String, budgetPerGroup: Long): DataFrame = {
    require(budgetPerGroup >= 1,
      s"budgetSelect needs budgetPerGroup >= 1, got $budgetPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(col("_score").desc, col(idCol).asc)
    // fail-loud in-plan guard (no extra pass, same shape as
    // Text.guardDocTokens): one NULL token would make the running window
    // sum NULL from that rank onward and SILENTLY drop every later row in
    // the group, and a NULL score sorts by engine default — neither is a
    // selection a user meant to make
    def nonNull(c: String) = when(col(c).isNull,
      raise_error(concat(lit(s"budgetSelect: NULL $c for "), col(idCol)
        .cast("string"), lit(" — a NULL token count silently truncates " +
          "its group's selection; filter or coalesce upstream"))))
      .otherwise(col(c))
    // the score rides under an internal alias so scoreCol == tokenCol
    // (rank big-docs-first) needs no special case
    df.select(col(idCol), col(groupCol), nonNull(tokenCol).as(tokenCol),
        nonNull(scoreCol).as("_score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      // ROWS, not the default RANGE frame: identical under a unique id
      // tie-break, but explicit is replayable in any engine
      .withColumn("cum_tokens", sum(col(tokenCol).cast("long")).over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)))
      .filter(col("cum_tokens") <= budgetPerGroup)
      .select(col(idCol), col(groupCol), col(tokenCol), col("rank"), col("cum_tokens"))
  }

  /** Exact per-group quantiles — the quality-filter THRESHOLD table
   * (keep the top 20% per language = cut at the 0.8 quantile of the
   * score distribution, per group): for each group and each q in `qs`,
   * the value at rank ⌈q·n⌉ of the group's values sorted ascending (the
   * lower empirical quantile — a value that OCCURS, never an
   * interpolation, so it replays bit-identically in any engine; the
   * value at a rank is well-defined under ties whatever row the rank
   * lands on). NULL values are excluded (they have no rank); q = 0 maps
   * to rank 1 (the minimum). Returns (groupCol, q, value, n) with `n`
   * the group's non-null count.
   *
   * Exact beats approximate here deliberately: `approx_percentile`'s
   * sketch is engine- and merge-order-specific, so a filter threshold
   * from it is not reproducible — and thresholds gate PERMANENT corpus
   * cuts. Scale shape: one window pass per group (groups are languages
   * or domains, same envelope as [[groupSample]]/[[budgetSelect]]);
   * `qs` is a handful of literals exploded per row AFTER ranking, so
   * the sort is paid once. */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      qs: Seq[Double]): DataFrame = {
    require(qs.nonEmpty, "groupQuantiles needs at least one quantile")
    qs.foreach(q => require(q >= 0.0 && q <= 1.0, s"quantile out of [0,1]: $q"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("_v").asc)
    val ranked = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol), col(valueCol).as("_v"))
      .withColumn("_rk", row_number().over(w))
      .withColumn("_n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col(groupCol))))
    val qArr = array(qs.map(lit): _*)
    ranked
      .withColumn("q", explode(qArr))
      .filter(col("_rk") === greatest(ceil(col("q") * col("_n")), lit(1L)))
      .select(col(groupCol), col("q"), col("_v").as("value"),
        col("_n").as("n"))
  }

  /** Quantile-gated corpus cut — [[groupQuantiles]] composed into the
   * filter it exists for (keep the top (1−q) of every language/domain by
   * quality score): compute the per-group q-threshold, broadcast the
   * tiny threshold table (one row per group — languages/domains number
   * thousands, never billions), and keep rows with
   * `score >= threshold`. Returns the input rows that survive, original
   * schema.
   *
   * Null semantics, spelled out because this gates PERMANENT cuts: rows
   * with a null score are dropped (no rank, no comparison); groups whose
   * scores are ALL null have no threshold and drop entirely; a null
   * group key never equi-joins a threshold row and drops. The threshold
   * itself is the exact rank-⌈q·n⌉ value ([[groupQuantiles]]), so the
   * kept set replays bit-identically in any engine.
   *
   * Scale shape: one window pass to build the threshold table, then ONE
   * broadcast hash join — the corpus-side scan never shuffles. */
  def quantileCut(df: DataFrame, groupCol: String, scoreCol: String,
      q: Double): DataFrame = {
    val thr = groupQuantiles(df.select(col(groupCol), col(scoreCol)),
        groupCol, scoreCol, Seq(q))
      .select(col(groupCol), col("value").as("_thr"))
    df.join(broadcast(thr), Seq(groupCol))
      .filter(col(scoreCol) >= col("_thr"))
      .select(df.columns.map(c => col(graft.GraphFrame.quoteName(c))): _*)
  }

  def groupSample(df: DataFrame, groupCol: String, idCol: String, k: Int,
      seed: Long = 42L): DataFrame = {
    require(k >= 1, s"groupSample needs k >= 1, got $k")
    val draw = md5(concat_ws("|", lit(seed), col(idCol).cast("string")))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(draw, col(idCol))
    df.withColumn("_gs_rk", row_number().over(w))
      .filter(col("_gs_rk") <= k).drop("_gs_rk")
  }

  /** Weighted sampling WITHOUT replacement, k winners with inclusion
   * odds exactly proportional to an integer weight column (sample k
   * documents ∝ token count, ∝ quality score ticks, …): each row enters
   * `w` md5 lottery tickets (draw_j = md5(seed|id|j), j = 1..w) and its
   * key is its best ticket; the k smallest keys win. Pooling all Σw
   * i.i.d. tickets, each is equally likely to be the global best, so
   * P(row wins the next slot) = w/Σw exactly — the Efraimidis–Spirakis
   * race in ticket form, chosen over the u^(1/w) key because it needs
   * NO transcendental: `pow`/`ln` are not correctly-rounded IEEE ops,
   * so their 1-ulp cross-engine wobble could flip the boundary of the
   * winner set, while min-of-draws replays bit-identically in any
   * engine with md5 (same reason the walks and NB scoring avoid
   * floats). Ties (two equal 60-bit draws) break by id.
   *
   * Cost: the ticket fan-out is Σw rows (narrow explode, map-side
   * min-combine into one shuffle of (id, key) pairs, then a distributed
   * TakeOrdered of k) — so weights are REQUIRED ≤ `maxWeight`
   * (fail-loud; rescale ratios, e.g. ⌈tokens/64⌉, to stay under it —
   * odds only need the ratio). Returns the winning rows of `df` with
   * `sample_rank` (1-based). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String, k: Int,
      seed: Long = 42L, maxWeight: Int = 4096): DataFrame = {
    require(k >= 1, s"weightedSample needs k >= 1, got $k")
    require(maxWeight >= 1, s"weightedSample needs maxWeight >= 1, got $maxWeight")
    val w = col(weightCol).cast("long")
    val mx = df.agg(max(w)).head()
    if (!mx.isNullAt(0))
      require(mx.getLong(0) <= maxWeight,
        s"weightedSample: max weight ${mx.getLong(0)} exceeds maxWeight=$maxWeight — " +
          "rescale the weights (ratios are all that matter) or raise the knob " +
          "(ticket fan-out is sum(weight) rows)")
    val draw = conv(substring(md5(concat_ws("|", lit(seed),
      col(idCol).cast("string"), col("_j").cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val winners = df.filter(w > 0)
      .select(col(idCol), explode(sequence(lit(1L), w)).as("_j"))
      .select(col(idCol), draw.as("_d"))
      .groupBy(idCol).agg(min("_d").as("_key"))
      .orderBy(col("_key"), col(idCol)).limit(k)
      .withColumn("sample_rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("_key"), col(idCol))))
    df.join(broadcast(winners), Seq(idCol))
      .drop("_key")
  }

  /** Approximate distinct count per group via a K-Minimum-Values sketch:
   * hash each distinct value to a 60-bit md5 fraction, keep the k
   * smallest per group ([[graft.expressions.KMinSampling]] — O(k) buffer
   * memory, map-side combinable), estimate (k−1)/h₍k₎; groups with fewer
   * than k distinct hashes report the exact count. Deterministic — the
   * md5 draw has no RNG state, so the estimate (relative error ~1/√(k−2))
   * replays bit-identically anywhere, DuckDB included. Values hash
   * through their Spark string form (`CAST(value AS STRING)`); the
   * `(group, hash)` dedup is one shuffle of 8-byte pairs — the unsketched
   * part of the cost, exact by construction. Returns
   * (groupCol, approx_distinct: double). */
  def approxDistinct(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 3, s"approxDistinct needs k >= 3 (got $k): the (k-1)/h estimator")
    val h = conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10)
      .cast("long")
    val d = df.filter(col(groupCol).isNotNull && col(valueCol).isNotNull)
      .select(col(groupCol), h.as("_h")).distinct()
    val kmin = graft.expressions.KMinSampling.sampleLong(k)
    d.groupBy(col(groupCol))
      .agg(kmin(col("_h"), col("_h")).as("_mins"), count(lit(1)).as("_nd"))
      .select(col(groupCol),
        when(col("_nd") < k, col("_nd").cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("_mins"), k).cast("double") /
              lit(1152921504606846976.0 /* 2^60 */)))
          .as("approx_distinct"))
  }
}
