package graft.embeddings

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Composite random-walk node-embedding builder (API role of reference
 * embeddings/RandomWalkEmbeddings.scala:46-367): configure the walk
 * generator, pick the sequence model (Spark ML Word2Vec or the
 * vocabulary-free [[Hash2Vec]]), optionally concatenate a sampled 1-hop
 * neighbor-mean convolution, and optionally clean the walk generator's
 * persisted batches after training.
 *
 * Where the reference takes `Either[Word2Vec, Hash2Vec]` builder objects,
 * this engine keys the model by name with flat knob setters — the same
 * capability without re-exporting third-party builder types through the
 * public surface. A fully configured [[graft.rw.RandomWalks]] can be
 * injected via [[setRandomWalks]] (reference `setRandomWalks` parity),
 * including its batch-persisted resumable mode.
 */
class RandomWalkEmbeddings(g: GraphFrame) {
  import GraphFrame.ID

  private var rwCustom: Option[graft.rw.RandomWalks] = None
  private var useEdgeDirections = true
  private var seedV = 42L
  private var model = "word2vec"
  private var dimV = 32
  private var walkLengthV = 5
  private var walksPerVertexV = 4
  private var restartProbV = 0.0
  private var rwMaxNbrsV = 64
  // word2vec
  private var w2vMaxIterV = 1
  private var w2vWindowV = 5
  private var w2vMinCountV = 0
  private var w2vStepSizeV = 0.025
  // hash2vec
  private var h2vContextV = 5
  private var h2vDecayV = "gaussian"
  private var h2vSigmaV = 1.0
  private var h2vDoNormV = true
  private var h2vSafeNormV = true
  // neighbor aggregation
  private var aggNbrsV = false
  private var aggMaxNbrsV = 16
  private var cleanUpV = false

  /** "word2vec" (default) or "hash2vec". */
  def setSequenceModel(m: String): this.type = {
    require(m == "word2vec" || m == "hash2vec", s"unknown sequence model '$m'")
    model = m; this
  }
  /** Inject a fully configured walk generator (batching, hash mode,
   * restart, run-id resume); its seed/length settings win over this
   * builder's. */
  def setRandomWalks(rw: graft.rw.RandomWalks): this.type = { rwCustom = Some(rw); this }
  def setSeed(s: Long): this.type = { seedV = s; this }
  /** false: walk the symmetrized graph (reference setUseEdgeDirections). */
  def setUseEdgeDirections(b: Boolean): this.type = { useEdgeDirections = b; this }
  def setDim(d: Int): this.type = { dimV = d; this }
  def setWalkLength(n: Int): this.type = { walkLengthV = n; this }
  def setNumWalksPerNode(n: Int): this.type = { walksPerVertexV = n; this }
  def setRestartProbability(p: Double): this.type = { restartProbV = p; this }
  def setRwMaxNbrs(n: Int): this.type = { rwMaxNbrsV = n; this }
  def setWord2VecMaxIter(n: Int): this.type = { w2vMaxIterV = n; this }
  def setWord2VecWindowSize(n: Int): this.type = { w2vWindowV = n; this }
  def setWord2VecMinCount(n: Int): this.type = { w2vMinCountV = n; this }
  def setWord2VecStepSize(s: Double): this.type = { w2vStepSizeV = s; this }
  def setHash2VecContextSize(n: Int): this.type = { h2vContextV = n; this }
  def setHash2VecDecayFunction(d: String): this.type = { h2vDecayV = d; this }
  def setHash2VecGaussianSigma(s: Double): this.type = { h2vSigmaV = s; this }
  def setHash2VecDoL2Norm(b: Boolean): this.type = { h2vDoNormV = b; this }
  def setHash2VecSafeL2(b: Boolean): this.type = { h2vSafeNormV = b; this }
  /** Concatenate the sampled 1-hop neighbor mean of the trained vectors
   * (reference setAggregateNeighbors). */
  def setAggregateNeighbors(b: Boolean): this.type = { aggNbrsV = b; this }
  def setMaxNbrs(n: Int): this.type = { aggMaxNbrsV = n; this }
  /** Delete the walk generator's persisted batches after training
   * (only meaningful with an injected batched [[setRandomWalks]]). */
  def setCleanUpAfterRun(b: Boolean): this.type = { cleanUpV = b; this }

  /** (id, embedding: array<double>). With neighbor aggregation the vector
   * is `own ++ mean(sampled neighbors)` (width doubles). */
  def run(): DataFrame = {
    val base = if (useEdgeDirections) g else g.asUndirected()
    val rw = rwCustom.getOrElse(
      base.randomWalks
        .setWalkLength(walkLengthV).setWalksPerVertex(walksPerVertexV)
        .setRestartProbability(restartProbV)
        .setMaxNeighborsPerVertex(rwMaxNbrsV).setSeed(seedV))
    val walks = rw.run()

    val trained = model match {
      case "word2vec" =>
        val sentences = walks.select(
          transform(col("random_walk"), v => v.cast("string")).as("sentence"))
        val w2v = new org.apache.spark.ml.feature.Word2Vec()
          .setInputCol("sentence").setOutputCol("vec")
          .setVectorSize(dimV).setMinCount(w2vMinCountV).setSeed(seedV)
          .setMaxIter(w2vMaxIterV).setWindowSize(w2vWindowV)
          .setStepSize(w2vStepSizeV)
        w2v.fit(sentences).getVectors.select(col("word").as(ID),
          org.apache.spark.ml.functions.vector_to_array(col("vector")).as("embedding"))
      case "hash2vec" =>
        Hash2Vec.embedSequences(
          walks.select(col("random_walk").cast("array<string>").as("seq")), "seq",
          dim = dimV, contextSize = h2vContextV, decay = h2vDecayV,
          gaussianSigma = h2vSigmaV, doNorm = h2vDoNormV, safeNorm = h2vSafeNormV,
          seed = seedV)
          .select(col("id").as(ID), col("vector").as("embedding"))
    }
    val out =
      if (!aggNbrsV) trained
      else {
        // align the trained (string) ids back to the graph's id type so
        // the convolution's joins stay type-consistent
        val idType = g.vertices.schema(ID).dataType
        val typed = trained.select(col(ID).cast(idType).as(ID), col("embedding"))
        Embeddings.samplingConvolution(base, typed,
            sampleSize = aggMaxNbrsV, seed = seedV)
          .select(col(ID), col("conv_embedding").as("embedding"))
      }
    // materialize before any cleanup deletes the walk batches under us
    val result = if (cleanUpV) out.localCheckpoint(true) else out
    if (cleanUpV) rw.cleanUp()
    result
  }
}
