package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Personalized PageRank from many sources at once (role of reference
 * lib/ParallelPersonalizedPageRank.scala:56-129, GraphX-only there;
 * re-expressed on the DataFrame Pregel per SURVEY §7).
 *
 * Vertex state is `pageranks: array<double>` — one lane per source — so
 * all personalizations share every join/shuffle of a superstep; the only
 * growth is the payload width. Teleport mass for lane i lands exclusively
 * on source i.
 *
 * Returns a GraphFrame like the reference (:76): vertices +
 * `pageranks: array<double>` (the reference uses an ml SparseVector —
 * documented divergence), edges + `weight: double` = 1/outDegree(src).
 */
class ParallelPersonalizedPageRank(g: GraphFrame) {
  import GraphFrame.ID

  private var resetProb: Double = 0.15
  private var maxIterV: Option[Int] = None
  private var sourcesV: Seq[Any] = Nil

  def resetProbability(p: Double): this.type = { resetProb = p; this }
  def maxIter(n: Int): this.type = { maxIterV = Some(n); this }
  def sourceIds(ids: Seq[Any]): this.type = { sourcesV = ids; this }

  def run(): GraphFrame = {
    // both knobs are mandatory, like the reference's builder
    // (ParallelPersonalizedPageRank.scala:69-77 check() requires maxIter
    // and a non-empty sourceIds before running)
    require(maxIterV.nonEmpty, "parallelPersonalizedPageRank: maxIter required")
    require(sourcesV.nonEmpty, "parallelPersonalizedPageRank: sourceIds required")
    val outDeg = g.outDegrees
    val v = g.vertices.join(outDeg, Seq(ID), "left_outer")
      .na.fill(0, Seq("outDegree"))
      .withColumnRenamed("outDegree", "_pr_outdeg")
    val g2 = GraphFrame(v, g.edges)

    val lanes = sourcesV.map(s => when(col(ID) === lit(s), lit(1.0)).otherwise(lit(0.0)))
    val initRanks = array(lanes: _*)
    val teleport = array(sourcesV.map(s =>
      when(col(ID) === lit(s), lit(resetProb)).otherwise(lit(0.0))): _*)
    val zeros = array(sourcesV.map(_ => lit(0.0)): _*)

    val incoming = coalesce(Pregel.msg, zeros)
    val newRanks = zip_with(teleport, incoming, (t, m) => t + lit(1.0 - resetProb) * m)

    val ranks = g2.pregel
      .withVertexColumn("pageranks", initRanks, newRanks)
      .sendMsgToDst(transform(Pregel.src("pageranks"),
        r => r / Pregel.src("_pr_outdeg")))
      // constant-size combine buffer (one lane per source) — a hub's inbox
      // never materializes, unlike aggregate(collect_list(...), zip_with)
      .aggMsgs(graft.expressions.IterAggregates.arraySum(Pregel.msg))
      .setMaxIter(maxIterV.get)
      .run()
      .drop("_pr_outdeg")

    val weights = g.edges
      .join(outDeg.select(col(ID).as(GraphFrame.SRC), col("outDegree").as("_pr_od")),
        Seq(GraphFrame.SRC), "left_outer")
      .withColumn(GraphFrame.WEIGHT, lit(1.0) / col("_pr_od"))
      .drop("_pr_od")
    GraphFrame(ranks, weights)
  }
}
