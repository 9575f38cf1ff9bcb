package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * SVD++ collaborative filtering on a bipartite user→item rating graph
 * (role of reference lib/SVDPlusPlus.scala:95-257). Delegates the gradient
 * loop to the public Spark GraphX implementation over the surrogate Long
 * ids (the reference runs its vendored fork; ours bridges to stock
 * GraphX — SURVEY §7 divergence note), then joins the learned factors
 * back onto the original vertices.
 *
 * Returns vertices + `q, p: array<double>` (latent factors), `bias,
 * norm_deviation: double`; the training loss is exposed via [[lastLoss]].
 */
class SVDPlusPlus(g: GraphFrame) {
  import GraphFrame.{ID, LONG_ID, LONG_SRC, LONG_DST, ATTR, WEIGHT}

  private var rank: Int = 10
  private var maxIterV: Int = 5
  private var minValue: Double = 0.0
  private var maxValue: Double = 5.0
  private var gamma1 = 0.007; private var gamma2 = 0.007
  private var gamma6 = 0.005; private var gamma7 = 0.015

  def setRank(r: Int): this.type = { rank = r; this }
  def maxIter(n: Int): this.type = { maxIterV = n; this }
  def setMinValue(v: Double): this.type = { minValue = v; this }
  def setMaxValue(v: Double): this.type = { maxValue = v; this }

  @volatile var lastLoss: Double = Double.NaN

  def run(): DataFrame = {
    require(g.edges.columns.contains(WEIGHT), "svdPlusPlus: edges need a 'weight' column")
    val conf = new org.apache.spark.graphx.lib.SVDPlusPlus.Conf(
      rank, maxIterV, minValue, maxValue, gamma1, gamma2, gamma6, gamma7)
    val edgeRdd = g.indexedEdges
      .select(col(LONG_SRC), col(LONG_DST), col(s"$ATTR.$WEIGHT").cast("double"))
      .rdd.map(r => org.apache.spark.graphx.Edge(r.getLong(0), r.getLong(1), r.getDouble(2)))
    val (model, loss) = org.apache.spark.graphx.lib.SVDPlusPlus.run(edgeRdd, conf)
    lastLoss = loss
    val spark = g.spark
    import spark.implicits._
    val factors = model.vertices
      .map { case (vid, (q, p, bias, norm)) => (vid, q.toSeq, p.toSeq, bias, norm) }
      .toDF(LONG_ID, "q", "p", "bias", "norm_deviation")
    g.indexedVertices.select(col(LONG_ID), col(ID))
      .join(factors, LONG_ID)
      .drop(LONG_ID)
      .join(g.vertices, Seq(ID), "right_outer")
  }
}
