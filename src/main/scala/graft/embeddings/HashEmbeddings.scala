package graft.embeddings

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Vocabulary-free feature-hashing embeddings (role of reference
 * embeddings/Hash2Vec.scala:48-584): each co-occurring context token adds
 * a hash-signed contribution to a fixed-width vector, so no vocabulary
 * table, no training loop, and the whole computation is one hash
 * aggregation — deterministic and linear in corpus size.
 *
 * The reference implements this with per-partition float matrices in
 * `mapPartitions`; this version expresses the same math as codegen'd
 * column expressions, so Catalyst handles partial aggregation map-side.
 */
object HashEmbeddings {

  /** Embed items by their contexts: input (item, context) pairs, output
   * (id, embedding: array<double>) where
   * embedding[j] = Σ_ctx sign(xxhash64(ctx, j)) scaled by 1/√n. */
  def fromPairs(pairs: DataFrame, itemCol: String, contextCol: String,
      dim: Int = 16): DataFrame = {
    def contrib(j: Int): Column =
      sum(when(pmod(xxhash64(col(contextCol), lit(j)), lit(2)) === 0, 1.0).otherwise(-1.0))
    val lanes = (0 until dim).map(j => contrib(j).as(s"_h$j"))
    pairs.groupBy(col(itemCol).as(graft.GraphFrame.ID))
      .agg(lanes.head, lanes.tail :+ count(lit(1)).as("_n"): _*)
      .select(col(graft.GraphFrame.ID),
        transform(array((0 until dim).map(j => col(s"_h$j")): _*),
          v => v / sqrt(col("_n"))).as("embedding"))
  }

  /** Graph variant: contexts are random-walk co-occurrences within
   * `window` hops. */
  def forGraph(g: graft.GraphFrame, dim: Int = 16, walkLength: Int = 5,
      walksPerVertex: Int = 4, window: Int = 2, seed: Long = 42L): DataFrame = {
    val walks = g.randomWalks
      .setWalkLength(walkLength).setWalksPerVertex(walksPerVertex).setSeed(seed)
      .run()
    // symmetric window around the (1-based) center p+1: [p+1-window,
    // p+1+window] clamped to the walk — deriving the length from the
    // clamped ends keeps early centers from over-extending rightward
    val start = greatest(col("_pos") - window + 1, lit(1))
    val end = least(col("_pos") + window + 1, size(col("random_walk")))
    val pairs = walks
      .select(posexplode(col("random_walk")).as(Seq("_pos", "_center")), col("random_walk"))
      .select(col("_center"),
        explode(slice(col("random_walk"), start, end - start + 1)).as("_context"))
      .filter(col("_center") =!= col("_context"))
      .select(col("_center").cast("string").as("item"),
        col("_context").cast("string").as("context"))
    fromPairs(pairs, "item", "context", dim)
  }
}
