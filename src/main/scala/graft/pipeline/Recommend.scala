package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Basket-level co-occurrence recommendation primitives ("customers who
 * bought X also bought Y") — the classic item-item collaborative
 * filtering counts of Linden–Smith–York, IEEE Internet Computing'03,
 * re-expressed as two hash aggregations and one bounded self-join.
 *
 * Scale design (100 TB of order lines): the basket self-join fans out
 * O(w²) pairs per basket of width w, so pathological baskets (a crawler
 * account, a b2b bulk order) are CUT at `maxBasket` before the join —
 * the cap makes the worst-case fan-out an explicit, auditable constant
 * instead of a silent quadratic. Pair counting is a hash aggregation on
 * (item_a, item_b) with map-side partial combine; no window, no global
 * sort. Ranking the top-k neighbors per item is one per-item window over
 * the PAIR table (items² at most, already collapsed), never the raw
 * order lines.
 */
object Recommend {

  /** Canonical co-occurrence pair counts: for every basket, every
   * unordered item pair (item_a < item_b) it contains, counted over
   * baskets. Items are deduplicated inside a basket first (two lines of
   * the same part in one order count once). Baskets wider than
   * `maxBasket` distinct items are dropped entirely — their pair
   * explosion is quadratic and their signal is noise (bulk orders
   * co-contain everything). Returns (item_a, item_b, n_baskets). */
  def coOccurrence(df: DataFrame, basketCol: String, itemCol: String,
      maxBasket: Int = 1000): DataFrame = {
    require(maxBasket >= 2, s"maxBasket must be >= 2: $maxBasket")
    val items = df.select(col(basketCol).as("_b"), col(itemCol).as("_i")).distinct()
    val keptBaskets = items.groupBy("_b").agg(count(lit(1)).as("_w"))
      .filter(col("_w") <= maxBasket).select("_b")
    // the deduped item frame feeds the width filter and BOTH self-join
    // sides — exchange reuse across aliases is not guaranteed, so persist
    // (MEMORY_AND_DISK: narrow rows, spills rather than OOMs at scale);
    // release after consuming via [[graft.pipeline.releaseShared]]
    val kept = items.join(keptBaskets, "_b")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    kept.as("x").join(kept.as("y"), "_b")
      .filter(col("x._i") < col("y._i"))
      .groupBy(col("x._i").as("item_a"), col("y._i").as("item_b"))
      .agg(count(lit(1)).as("n_baskets"))
  }

  /** Top-k "also bought" neighbors per item from canonical pair counts:
   * both orientations of each pair, ranked per item by
   * (n_baskets desc, other-item asc) — fully deterministic. Returns
   * (item, also_bought, n_baskets, rank). */
  def alsoBought(pairs: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    // both orientations via ONE explode, not a self-union — a union
    // consumes the pair subtree twice, and at scale the co-occurrence
    // join is the expensive part of the plan
    val both = pairs.select(explode(array(
        struct(col("item_a").as("item"), col("item_b").as("also_bought")),
        struct(col("item_b").as("item"), col("item_a").as("also_bought"))))
        .as("_p"), col("n_baskets"))
      .select(col("_p.item"), col("_p.also_bought"), col("n_baskets"))
    val w = Window.partitionBy("item")
      .orderBy(col("n_baskets").desc, col("also_bought").asc)
    both.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("item"), col("also_bought"), col("n_baskets"),
        col("rank").cast("long").as("rank"))
  }
}
