package graft.embeddings

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame
import graft.expressions.KMinSampling

/**
 * Graph embeddings (role of reference embeddings/RandomWalkEmbeddings
 * .scala:46-367 and convolutions/SamplingConvolution.scala:24-177):
 * random-walk corpora fed to Spark ML Word2Vec, plus a 1-hop GNN-style
 * neighbor-mean convolution over bounded neighbor samples.
 */
object Embeddings {

  /** DeepWalk-style embeddings: hash-seeded random walks as sentences,
   * Spark ML Word2Vec as the trainer. Returns (id: string,
   * embedding: array<double>) — ids are stringified for the vocabulary. */
  def randomWalkEmbeddings(g: GraphFrame, dim: Int = 32, walkLength: Int = 5,
      walksPerVertex: Int = 4, seed: Long = 42L): DataFrame = {
    val walks = g.randomWalks
      .setWalkLength(walkLength).setWalksPerVertex(walksPerVertex).setSeed(seed)
      .run()
      .select(transform(col("random_walk"), v => v.cast("string")).as("sentence"))
    val w2v = new org.apache.spark.ml.feature.Word2Vec()
      .setInputCol("sentence").setOutputCol("vec")
      .setVectorSize(dim).setMinCount(0).setSeed(seed)
    val model = w2v.fit(walks)
    model.getVectors.select(col("word").as(GraphFrame.ID),
      org.apache.spark.ml.functions.vector_to_array(col("vector")).as("embedding"))
  }

  /** 1-hop sampling convolution: mean of up to `sampleSize` neighbors'
   * embeddings concatenated with the vertex's own (reference
   * SamplingConvolution.scala:132-176). `embeddings` is (id, embedding:
   * array<double>); returns (id, conv_embedding). The k-min sample bounds
   * hub fan-in to O(k). */
  def samplingConvolution(g: GraphFrame, embeddings: DataFrame,
      sampleSize: Int = 16, seed: Long = 42L): DataFrame = {
    import GraphFrame.{ID, SRC, DST}
    val idIsLong = g.vertices.schema(ID).dataType ==
      org.apache.spark.sql.types.LongType
    val sampler =
      if (idIsLong) KMinSampling.sampleLong(sampleSize)
      else KMinSampling.sampleString(sampleSize)
    val sampled = g.edges
      .select(col(SRC), col(DST), xxhash64(col(SRC), col(DST), lit(seed)).as("_w"))
      .groupBy(col(SRC).as(ID))
      .agg(sampler(col("_w"), if (idIsLong) col(DST) else col(DST).cast("string"))
        .as("_nbrs"))
    val nbrEmb = sampled
      .select(col(ID), explode(col("_nbrs")).as("_nb"))
      .join(embeddings.select(col(ID).cast("string").as("_nb_id"),
        col("embedding").as("_nb_emb")), col("_nb").cast("string") === col("_nb_id"))
      .groupBy(ID)
      .agg(collect_list(col("_nb_emb")).as("_embs"))
      .select(col(ID),
        // element-wise mean over the (bounded) sample
        transform(
          aggregate(col("_embs"),
            transform(element_at(col("_embs"), 1), _ => lit(0.0)),
            (acc, e) => zip_with(acc, e, (a, b) => a + b)),
          s => s / size(col("_embs"))).as("_mean"))
    embeddings
      .join(nbrEmb, Seq(ID), "left_outer")
      .select(col(ID),
        concat(col("embedding"),
          coalesce(col("_mean"), transform(col("embedding"), _ => lit(0.0))))
          .as("conv_embedding"))
  }
}
