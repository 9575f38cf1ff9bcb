package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.GraphFrame
import graft.lib.AggregateMessages

/**
 * Grid Ising model + iterative belief updates with color-coded scheduling
 * (role of reference examples/BeliefPropagation.scala + Graphs.scala
 * gridIsingModel:196-243).
 *
 * The n×n grid is 2-colorable; each sweep updates one color class from
 * the other's current beliefs (checkerboard Gauss–Seidel — converges
 * faster than Jacobi all-at-once updates and demonstrates scheduled
 * message passing on [[graft.lib.AggregateMessages]]). Mean-field update:
 * belief(v) ← tanh(a_v + Σ_{u~v} b_uv · belief(u)).
 */
object GridIsing {

  /** n×n grid with ids "i,j", hash-derived vertex fields `a` and coupling
   * strengths `b` (deterministic — no RNG state, retry-safe). */
  def gridIsingModel(spark: SparkSession, n: Int,
      vStd: Double = 1.0, eStd: Double = 1.0): GraphFrame = {
    val cells = spark.range(n.toLong * n)
      .select((col("id") / n).cast("int").as("i"), (col("id") % n).cast("int").as("j"))
    def noise(cols: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
      (pmod(xxhash64(cols: _*), lit(2000001L)) - 1000000L) / 1000000.0
    val v = cells.select(concat_ws(",", col("i"), col("j")).as("id"),
      col("i"), col("j"), (noise(col("i"), col("j")) * vStd).as("a"))
    val right = cells.filter(col("j") < n - 1).select(
      concat_ws(",", col("i"), col("j")).as("src"),
      concat_ws(",", col("i"), col("j") + 1).as("dst"))
    val down = cells.filter(col("i") < n - 1).select(
      concat_ws(",", col("i"), col("j")).as("src"),
      concat_ws(",", col("i") + 1, col("j")).as("dst"))
    val e = right.unionByName(down)
      .withColumn("b", noise(col("src"), col("dst")) * eStd)
    GraphFrame(v, e)
  }

  /** Run `sweeps` checkerboard belief sweeps; returns vertices + `belief`. */
  def beliefUpdates(g: GraphFrame, sweeps: Int = 5): DataFrame = {
    import GraphFrame.ID
    // color class from the grid coordinates; both directions of each edge
    val und = g.asUndirected()
    var beliefs = g.vertices
      .withColumn("color", pmod(col("i") + col("j"), lit(2)))
      .withColumn("belief", tanh(col("a")))
    for (_ <- 1 to sweeps; c <- 0 to 1) {
      val gc = GraphFrame(beliefs, und.edges)
      val incoming = gc.aggregateMessages
        .sendToDst(AggregateMessages.edge("b") * AggregateMessages.src("belief"))
        .agg(sum(AggregateMessages.msg).as("_nbr_field"))
      beliefs = beliefs.join(incoming, Seq(ID), "left_outer")
        .withColumn("belief",
          when(col("color") === c,
            tanh(col("a") + coalesce(col("_nbr_field"), lit(0.0))))
            .otherwise(col("belief")))
        .drop("_nbr_field")
        .localCheckpoint(true)
    }
    beliefs.drop("color")
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(6)
    val spark = SparkSession.builder()
      .master("local[8]").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = gridIsingModel(spark, n)
    val out = beliefUpdates(g, sweeps = 5)
    out.orderBy("i", "j").show(n * 2, false)
    spark.stop()
  }
}
