package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-trained classifiers for pipeline curation (fastText-style
 * quality/language gates, but with closed-form training so every number
 * is replayable by an independent engine).
 *
 * Multinomial Naive Bayes with Laplace smoothing: the classic
 * closed-form text classifier (McCallum & Nigam, "A comparison of event
 * models for Naive Bayes text classification", AAAI-98 workshop). All
 * per-token log-likelihoods are FIXED-POINT micro-units
 * (round(ln(p)·1e6) as a 64-bit integer) so the per-document sum is an
 * exact integer — order-independent under any shuffle/AQE plan, and
 * bit-replayable in SQL. A double-precision sum of logs would depend on
 * Spark's aggregation order; the fixed-point quantization (≤ 0.5e-6
 * per token) is far below any decision margin that could matter.
 *
 * Scale shape: training is one (token, label) hash aggregation over the
 * train split plus label-count/vocab aggregates (a handful of rows —
 * broadcast). Scoring joins the exploded test tokens to the model on
 * the token key (Spark broadcasts the model when it fits, shuffle-joins
 * otherwise — both correct), then one (doc, label) sum and a per-doc
 * argmax window. No driver-side state beyond the label list.
 */
object Classify {

  /** Fixed-point micro-units of ln(p): round half away from zero, the
   * rule DuckDB's ROUND also uses. */
  private def fpLog(p: Column): Column =
    round(log(p) * lit(1e6), 0).cast("long")

  /**
   * Train multinomial NB on the md5-split train fraction of `df0` and
   * predict `labelCol` for the held-out rows. The split draws the same
   * 16-bit hash the samplers use: a row trains iff
   * `draw16(seed|id) < round(trainFraction·2^16)` (deterministic, no
   * RNG state). Returns one row per TEST document:
   * (idCol, predicted, score) where `score` is the winning class's
   * fixed-point log-posterior (micro-nats, exact Long) and ties break
   * to the smallest label string.
   *
   * Smoothing: P(t|c) = (cnt(t,c)+1) / (tot_c + V), V = train vocab
   * size; a test token unseen for class c contributes the same formula
   * at cnt 0 (tokens unseen in the whole train corpus included).
   * Priors: P(c) = train docs in c / train docs. Classes are the labels
   * present in the TRAIN split.
   */
  def naiveBayesTrainPredict(df0: DataFrame, idCol: String, textCol: String,
      labelCol: String, trainFraction: Double = 0.75,
      seed: Long = 42L): DataFrame = {
    require(trainFraction > 0 && trainFraction < 1,
      s"trainFraction must be in (0,1): $trainFraction")
    val df = ensureParallelism(df0)
    val threshold = math.round(trainFraction * 65536.0).toInt
    val drawn = conv(substring(md5(concat_ws("|",
      lit(seed), col(idCol).cast("string"))), 1, 4), 16, 10).cast("int")
    val isTrain = drawn < lit(threshold)

    val train = df.filter(isTrain)
      .select(col(idCol).as("_d"), col(labelCol).as("_c"), col(textCol).as("_t"))
    val test = df.filter(!isTrain)
      .select(col(idCol).as("_d"), col(textCol).as("_t"))

    // (token, class) occurrence counts over the train split — persisted
    // (r15): consumed by the vocab count, the per-class totals (which
    // feed priors) and the model rows; unpersisted, the train tokenize +
    // aggregation legally re-ran per consumer (4 extra corpus scans in
    // the gate plan). Released via [[graft.pipeline.releaseShared]] /
    // session cache clear.
    val tokTrain = train.select(col("_c"),
      explode(Text.tokens(col("_t"))).as("_tok"))
    val tc = tokTrain.groupBy(col("_tok"), col("_c")).agg(count(lit(1)).as("_n"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // per-class occurrence totals, vocab size, doc priors: tiny frames
    val classTot = tc.groupBy("_c").agg(sum("_n").as("_tot"))
    val vocab = tc.select("_tok").distinct().count()
    // per-class train-doc counts, persisted: nTrainDocs is their one-job
    // sum and the prior projection reuses the cached rows instead of
    // re-scanning the train split (r15 — replaces the separate
    // train.count() action + per-consumer rescans)
    val dcs = train.groupBy("_c").agg(count(lit(1)).as("_dc"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nTrainDocs = dcs.agg(sum("_dc")).head() match {
      case r if r.isNullAt(0) => 0L
      case r => r.getLong(0)
    }
    require(nTrainDocs > 0, "naiveBayes: empty train split")
    val priors = dcs
      .join(classTot, Seq("_c"), "inner") // classes with zero train tokens carry no model
      .select(col("_c"),
        fpLog(col("_dc").cast("double") / lit(nTrainDocs.toDouble)).as("_fp_prior"),
        // default per-occurrence cost of a token unseen for this class
        fpLog(lit(1.0) / (col("_tot") + lit(vocab)).cast("double")).as("_fp_unseen"),
        col("_tot"))
    // model rows: fixed-point smoothed log-likelihood per (token, class)
    val model = tc.join(classTot, Seq("_c"))
      .select(col("_tok"), col("_c"),
        fpLog((col("_n") + lit(1)).cast("double") /
          (col("_tot") + lit(vocab)).cast("double")).as("_fp"))

    // score: every test token occurrence × every class (classes are a
    // broadcast handful), model join on the token key
    val testTok = test.select(col("_d"), explode(Text.tokens(col("_t"))).as("_tok"))
    val perClass = testTok
      .crossJoin(broadcast(priors.select(col("_c"), col("_fp_unseen"))))
      .join(model, Seq("_tok", "_c"), "left_outer")
      .select(col("_d"), col("_c"), coalesce(col("_fp"), col("_fp_unseen")).as("_x"))
      .groupBy(col("_d"), col("_c")).agg(sum("_x").as("_s"))
    // empty docs score prior-only for every class: seed a zero row per doc
    val base = test.select(col("_d")).crossJoin(broadcast(priors.select(col("_c"))))
      .select(col("_d"), col("_c"), lit(0L).as("_s"))
    val scored = perClass.unionByName(base)
      .groupBy(col("_d"), col("_c")).agg(sum("_s").as("_sum"))
      .join(broadcast(priors.select(col("_c"), col("_fp_prior"))), Seq("_c"))
      .select(col("_d"), col("_c"), (col("_sum") + col("_fp_prior")).as("_score"))
    val w = Window.partitionBy(col("_d")).orderBy(col("_score").desc, col("_c").asc)
    scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
      .select(col("_d").as(idCol), col("_c").as("predicted"),
        col("_score").as("score"))
  }
}
