package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * PageRank on the DataFrame Pregel (un-normalized, matching reference
 * semantics — lib/PageRank.scala:58-66 documents that ranks are NOT
 * normalized to sum 1; scores sum to ~V for the standard formulation).
 *
 * update: rank = resetProb + (1 - resetProb) * Σ incoming (rank/outDeg).
 * Dangling vertices (outDeg 0) just leak mass, as in GraphX static PR.
 *
 * Returns a GraphFrame: vertices + `pagerank: double`,
 * edges + `weight: double` (1/outDegree of src).
 */
class PageRank(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var resetProb: Double = 0.15
  private var maxIterV: Int = 10
  private var tolV: Option[Double] = None
  private var srcIdV: Option[Any] = None

  def resetProbability(p: Double): this.type = { resetProb = p; this }
  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** Tolerance mode: run until every vertex's rank moves < tol. */
  def tol(t: Double): this.type = { tolV = Some(t); this }
  /** Personalized PageRank from a single source vertex. */
  def sourceId(id: Any): this.type = { srcIdV = Some(id); this }

  private var weightColV: Option[String] = None
  /** Weighted PageRank (engine extension): each vertex distributes its
   * rank proportionally to this edge column instead of uniformly —
   * rank += (1-α)·Σ rank_u·w_uv/W_u with W_u the source's out-weight
   * sum. Null or negative weights fail eagerly (a null would silently
   * become a zero-mass edge); zero weights are legal (the edge carries
   * no mass). Same shuffle shape as the uniform plan — the weight rides
   * the existing edge struct. */
  def weightCol(c: String): this.type = { weightColV = Some(c); this }

  private var reliableDirV: Option[String] = None
  /** Reliable checkpointing under `dir` (see Pregel.setUseReliableCheckpoint). */
  def setUseReliableCheckpoint(dir: String): this.type = {
    reliableDirV = Some(dir); this
  }

  def run(): GraphFrame = {
    weightColV.foreach { w =>
      val wc = col(GraphFrame.quoteName(w))
      require(g.edges.filter(wc.isNull || wc < 0).isEmpty,
        s"pageRank weightCol '$w' must be non-null and >= 0 on every edge")
    }
    // uniform: per-vertex out-degree; weighted: out-weight sum
    val outDeg = weightColV match {
      case Some(w) => g.edges
        .groupBy(col(SRC).as(ID))
        .agg(sum(col(GraphFrame.quoteName(w)).cast("double")).as("outDegree"))
      case None => g.outDegrees
    }
    val v = g.vertices.join(outDeg, Seq(ID), "left_outer")
      .na.fill(0, Seq("outDegree"))
      .withColumnRenamed("outDegree", "_pr_outdeg")
    val g2 = GraphFrame(v, g.edges)

    val isSource = srcIdV match {
      case Some(s) => col(ID) === lit(s)
      case None => lit(true)
    }
    val initRank = srcIdV match {
      case Some(_) => when(isSource, lit(1.0)).otherwise(lit(0.0))
      case None => lit(1.0)
    }
    val teleport = srcIdV match {
      // personalized: teleport mass only lands on the source vertex
      case Some(s) => when(col(ID) === lit(s), lit(resetProb)).otherwise(lit(0.0))
      case None => lit(resetProb)
    }
    val newRank = teleport +
      lit(1.0 - resetProb) * coalesce(Pregel.msg, lit(0.0))

    val contribution = weightColV match {
      // W_u = 0 means every out-weight is 0: no mass leaves (0/0 guarded)
      case Some(w) => when(Pregel.src("_pr_outdeg") > 0,
        Pregel.src("pagerank") * Pregel.edge(w) / Pregel.src("_pr_outdeg"))
        .otherwise(lit(0.0))
      case None => Pregel.src("pagerank") / Pregel.src("_pr_outdeg")
    }
    val pregel = g2.pregel
      .withVertexColumn("pagerank", initRank, newRank)
      .sendMsgToDst(contribution)
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(if (tolV.isDefined) 100 else maxIterV)
    reliableDirV.foreach(pregel.setUseReliableCheckpoint)

    tolV.foreach { t =>
      pregel
        .setInitialActiveVertexExpression(lit(true))
        .setUpdateActiveVertexExpression(abs(newRank - col("pagerank")) >= lit(t))
        .setStopIfAllNonActiveVertices(true)
    }

    val ranks = pregel.run()
      .drop("_pr_outdeg")

    val weights = g.edges
      .join(outDeg.select(col(ID).as(SRC), col("outDegree").as("_pr_od")), Seq(SRC), "left_outer")
      .withColumn(GraphFrame.WEIGHT, weightColV match {
        case Some(w) => when(col("_pr_od") > 0,
          col(GraphFrame.quoteName(w)).cast("double") / col("_pr_od"))
          .otherwise(lit(0.0))
        case None => lit(1.0) / col("_pr_od")
      })
      .drop("_pr_od")
    GraphFrame(ranks, weights)
  }
}
