package graft.lib

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Maximal independent set via Luby's algorithm (role of reference
 * lib/MaximalIndependentSet.scala:36-225).
 *
 * Per round every remaining vertex draws a priority; a vertex joins the
 * MIS when its priority is a strict minimum among its remaining
 * neighbors; winners and their neighbors leave the graph. Expected
 * O(log n) rounds.
 *
 * Deliberate divergence from the reference: priorities are
 * `xxhash64(id, seed, round)` instead of `rand()` — deterministic under
 * task retries and safe with AQE (the reference must disable AQE around
 * its `rand()`-dependent logic; hash-randomness sidesteps the hazard,
 * cf. reference RandomWalkBase.scala:322-325).
 */
class MaximalIndependentSet(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 100
  private var seedV: Long = 42L
  private var hashModeV: String = "xxhash64"

  def maxIter(n: Int): this.type = { maxIterV = n; this }
  def seed(s: Long): this.type = { seedV = s; this }
  /** "xxhash64" (default, fastest) or "md5" — md5 priorities reproduce in
   * engines without xxhash64 (e.g. DuckDB), enabling exact cross-engine
   * oracles; same determinism guarantees either way. */
  def setHashMode(m: String): this.type = {
    require(m == "xxhash64" || m == "md5", s"unknown hash mode $m")
    hashModeV = m; this
  }

  def run(): DataFrame = {
    val und = g.edges
      .filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
      .distinct()

    val mgr = IterationManager.withReliableDir(g.spark, None)
    var remaining = mgr.persistOnly(g.vertices.select(ID))
    val undP = mgr.persistOnly(und)
    var mis: Option[DataFrame] = None
    val roundWinners = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    var round = 0
    while (round < maxIterV && remaining.take(1).nonEmpty) {
      def prio(c: Column): Column =
        if (hashModeV == "md5")
          struct(md5(concat_ws("|", c.cast("string"), lit(seedV), lit(round))).as("h"), c.as("i"))
        else struct(xxhash64(c, lit(seedV), lit(round)).as("h"), c.as("i"))
      val er = undP
        .join(remaining.select(col(ID).as(SRC)), Seq(SRC), "left_semi")
        .join(remaining.select(col(ID).as(DST)), Seq(DST), "left_semi")
      // per remaining vertex: the minimum neighbor priority
      val nbrMin = er.select(col(SRC).as(ID), prio(col(DST)).as("p"))
        .unionAll(er.select(col(DST).as(ID), prio(col(SRC)).as("p")))
        .groupBy(ID).agg(min(col("p")).as("nbrMin"))
      val cand = remaining.join(nbrMin, Seq(ID), "left_outer")
        .filter(col("nbrMin").isNull || prio(col(ID)) < col("nbrMin"))
        .select(ID)
      val candP = mgr.persistOnly(cand)
      roundWinners += candP
      mis = Some(mis.map(_.unionAll(candP)).getOrElse(candP))
      val nbrOfCand = er.join(candP.select(col(ID).as(SRC)), Seq(SRC), "left_semi")
        .select(col(DST).as(ID))
        .unionAll(er.join(candP.select(col(ID).as(DST)), Seq(DST), "left_semi")
          .select(col(SRC).as(ID)))
        .distinct()
      remaining = mgr.cycle(
        remaining.join(candP, Seq(ID), "left_anti").join(nbrOfCand, Seq(ID), "left_anti"),
        round)
      round += 1
    }
    val out = mgr.finish(mis.map(m => g.vertices.join(m, Seq(ID), "left_semi"))
      .getOrElse(g.vertices.limit(0)))
    undP.unpersist(false)
    roundWinners.foreach(_.unpersist(false))
    out
  }
}
