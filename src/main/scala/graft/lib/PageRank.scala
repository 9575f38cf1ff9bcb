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

  private var reliableDirV: Option[String] = None
  /** Reliable checkpointing under `dir` (see Pregel.setUseReliableCheckpoint). */
  def setUseReliableCheckpoint(dir: String): this.type = {
    reliableDirV = Some(dir); this
  }

  def run(): GraphFrame = {
    val outDeg = g.outDegrees
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

    val pregel = g2.pregel
      .withVertexColumn("pagerank", initRank, newRank)
      .sendMsgToDst(Pregel.src("pagerank") / Pregel.src("_pr_outdeg"))
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
      .withColumn(GraphFrame.WEIGHT, lit(1.0) / col("_pr_od"))
      .drop("_pr_od")
    GraphFrame(ranks, weights)
  }
}
