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

  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)
  /** Same bounded driver tail as [[GreedyColoring]] — md5 mode only (the
   * local loop replays md5 hex ordering; xxhash64 is a Tungsten
   * internal). 0 disables; docs/THRESHOLDS.md row 11. */
  def setSmallGraphThreshold(n: Long): this.type = { smallGraphThresholdV = n; this }

  def run(): DataFrame = {
    val und = g.edges
      .filter(col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as(SRC), greatest(col(SRC), col(DST)).as(DST))
      .distinct()

    if (hashModeV == "md5" && smallGraphThresholdV > 0) {
      val undPre = und.persist()
      if (undPre.count() <= smallGraphThresholdV) {
        val r = runLocal(undPre)
        undPre.unpersist(false)
        return r
      }
      undPre.unpersist(false)
    }

    val mgr = IterationManager.withReliableDir(g.spark, None)
    var remaining = mgr.persistOnly(g.vertices.select(ID))
    val undP = mgr.persistOnly(und)
    var mis: Option[DataFrame] = None
    val roundWinners = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

    var round = 0
    while (round < maxIterV && remaining.take(1).nonEmpty) {
      // hash-only priority, deliberately WITHOUT an id tie-break (same
      // rule as GreedyColoring): on a collision neither endpoint wins and
      // both retry next round with a different hash — what the local tail
      // and the SQL oracle compute
      def prio(c: Column): Column =
        if (hashModeV == "md5")
          md5(concat_ws("|", c.cast("string"), lit(seedV), lit(round)))
        else xxhash64(c, lit(seedV), lit(round))
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
      // winners are CUT self-contained, not persisted: their plan reads
      // the evolving `remaining` frame, and a later cycle's
      // Dataset.unpersist of a lazy round entry re-compiles dependent
      // CacheManager entries — a persisted winner frame would drop its
      // built data and rebuild at finish() through freed cut blocks
      // (the MaximalMatching round-12 crash class; ≥ 3-round graphs)
      val candP = cand.localCheckpoint(true)
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
    // the finish cut copied the winner rows — release the per-round cuts'
    // RDD blocks (each cut's plan is only its own LogicalRDD, so release
    // cannot touch live manager state)
    roundWinners.foreach(IterationManager.release)
    out
  }

  /** Driver tail (md5 mode): identical Luby rounds — md5 hex strings
   * order the same way Spark's string min orders them, and the strict
   * hash-only winner rule matches the distributed path and the SQL
   * oracle. Pure function of the graph value (sorted adjacency). */
  private def runLocal(und: DataFrame): DataFrame = {
    import scala.collection.mutable
    val (edges, _) = LocalLinkAnalysis.collectGraph(und, g)
    val ids = g.vertices.select(col(ID)).collect().map(_.get(0))
      .sortBy(String.valueOf(_))
    val adj = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Any]]
    for ((s, d) <- edges) {
      adj.getOrElseUpdate(s, mutable.ArrayBuffer.empty) += d
      adj.getOrElseUpdate(d, mutable.ArrayBuffer.empty) += s
    }
    def h(v: Any, round: Int): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"${String.valueOf(v)}|$seedV|$round".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val mis = mutable.LinkedHashSet.empty[Any]
    val remaining = mutable.HashSet(ids.toSeq: _*)
    var round = 0
    while (round < maxIterV && remaining.nonEmpty) {
      val hs = remaining.iterator.map(v => (v, h(v, round))).toMap
      val winners = remaining.toSeq.sortBy(String.valueOf(_)).filter { v =>
        adj.getOrElse(v, Nil).filter(remaining).forall(n => hs(v) < hs(n))
      }
      winners.foreach(mis += _)
      val drop = winners.toSet ++
        winners.flatMap(v => adj.getOrElse(v, Nil).filter(remaining))
      remaining --= drop
      round += 1
    }
    // semi-join against the local winner set keeps vertex columns + types
    val idField = g.vertices.schema(ID)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(ID, idField.dataType, nullable = true)))
    val rel: java.util.List[org.apache.spark.sql.Row] = java.util.Arrays.asList(
      mis.toSeq.sortBy(String.valueOf(_))
        .map(v => org.apache.spark.sql.Row(v)): _*)
    g.vertices.join(
      broadcast(g.spark.createDataFrame(rel, schema)), Seq(ID), "left_semi")
  }
}
