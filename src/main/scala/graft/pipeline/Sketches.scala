package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Count-Min Sketch (Cormode–Muthukrishnan, J.Algorithms'05): sublinear
 * frequency summaries for heavy-hitter queries over unbounded key
 * domains. The sketch is `depth` hash rows × `width` counters; a key's
 * estimate is the MIN of its counter across rows — always ≥ the true
 * count, within εN with probability 1−δ for width = ⌈e/ε⌉,
 * depth = ⌈ln 1/δ⌉.
 *
 * Spark-first shape: the counter table IS one hash aggregation — every
 * key occurrence explodes to `depth` (row, bucket) cells and map-side
 * partial combine collapses them long before the shuffle, so the
 * shuffled state is ≤ depth·width rows REGARDLESS of corpus size (the
 * entire point of a sketch at 100 TB). Estimation joins the candidate
 * keys' cells against the BROADCAST counter table (≤ depth·width rows
 * by construction — the broadcast can never blow up).
 *
 * Determinism: buckets are md5 draws keyed (seed, row, key) — the same
 * sketch materializes on any partitioning, any retry, and an external
 * SQL engine replays every counter and estimate bit-identically.
 */
object Sketches {

  private def bucket(seed: Long, row: Column, key: Column, width: Int): Column =
    pmod(conv(substring(md5(concat_ws("|", lit(seed), row, key)), 1, 15),
      16, 10).cast("long"), lit(width.toLong))

  private def checkDims(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth out of [1, 16]: $depth")
    require(width >= 2 && width <= (1 << 20),
      s"width out of [2, ${1 << 20}]: $width — the counter table is " +
        "broadcast at estimate time, so its size is a hard budget")
  }

  /** Materialize the counter table from one pass over the data:
   * (row, bucket, cnt), at most depth·width rows. `keyCol` values are
   * hashed as strings (cast once); null keys are dropped. */
  def cmsCounters(df: DataFrame, keyCol: String, depth: Int, width: Int,
      seed: Long = 42L): DataFrame = {
    checkDims(depth, width)
    df.select(col(keyCol).cast("string").as("_k"))
      .filter(col("_k").isNotNull)
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .groupBy(col("row"), bucket(seed, col("row"), col("_k"), width).as("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Point-query estimates for `keys` (a one-column DataFrame of
   * candidate keys, e.g. the distinct keys of a sample): each key joins
   * its `depth` cells against the broadcast counter table; a missing
   * cell is 0 (only reachable for keys absent from the sketched data).
   * Returns (key, est) with est ≥ the true count. */
  def cmsEstimate(counters: DataFrame, keys: DataFrame, keyCol: String,
      depth: Int, width: Int, seed: Long = 42L): DataFrame = {
    checkDims(depth, width)
    // drop null candidate keys, mirroring cmsCounters: a null key would
    // survive distinct(), hash as the bare "seed|row" prefix (concat_ws
    // skips nulls) and emit a spurious (null, est) row
    val cells = keys.select(col(keyCol).cast("string").as("key")).distinct()
      .filter(col("key").isNotNull)
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bucket(seed, col("row"), col("key"), width))
    cells.join(broadcast(counters), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }

  /** Heavy hitters by sketch estimate: build the sketch over `df`,
   * estimate every distinct key, keep the top `k` by
   * (est desc, key asc) — deterministic. In production the counter
   * build and the candidate scan are the same single pass at scan
   * speed; the ranking is a TakeOrdered over distinct keys, never a
   * global sort of occurrences. Returns (key, est, rank). */
  def cmsTopK(df: DataFrame, keyCol: String, k: Int, depth: Int = 4,
      width: Int = 1024, seed: Long = 42L): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    checkDims(depth, width)
    // ONE pass over the occurrences (r15): the exact per-key counts feed
    // BOTH the counter table (a bucket's sum of key counts ≡ its count of
    // occurrences) and the candidate key set. The old spelling scanned the
    // corpus twice (counter build + distinct candidate keys) and paid the
    // md5 bucket draw per depth·OCCURRENCE; this pays one hash aggregation
    // per occurrence and the md5 work per depth·DISTINCT key. Estimates are
    // bit-identical: min over rows of the same bucket sums.
    val cells = ensureParallelism(df)
      .select(col(keyCol).cast("string").as("key"))
      .filter(col("key").isNotNull)
      .groupBy("key").agg(count(lit(1)).as("_kn"))
      .withColumn("row", explode(sequence(lit(0), lit(depth - 1))))
      .withColumn("bucket", bucket(seed, col("row"), col("key"), width))
      // consumed twice (counter aggregation + estimate join) — persisted so
      // the corpus aggregation and the 4·|keys| md5 draws run once;
      // released via [[graft.pipeline.releaseShared]] / session cache clear
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counters = cells.groupBy("row", "bucket").agg(sum("_kn").as("cnt"))
    val est = cells.join(broadcast(counters), Seq("row", "bucket"), "left")
      .groupBy("key")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
    est.orderBy(col("est").desc, col("key").asc).limit(k)
      .select(col("key"), col("est"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("est").desc, col("key").asc)).cast("long").as("rank"))
  }
}
