package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Community detection by synchronous modularity local moving — the
 * phase-1 "local moving" heuristic of Louvain (Blondel, Guillaume,
 * Lambiotte, Lefebvre, "Fast unfolding of communities in large
 * networks", J. Stat. Mech. 2008, P10008), run as a fixed number of
 * SYNCHRONOUS rounds so the result is deterministic and replayable
 * (the classic sequential sweep is order-dependent; a synchronous
 * sweep is not). Beyond the reference's library (no community-
 * detection operator other than CDLP exists there).
 *
 * Semantics: the graph is canonicalized to SIMPLE UNDIRECTED edges
 * (self-loops dropped, parallel/reciprocal edges collapsed, unit
 * weight). Every vertex starts in its own community. Each round, each
 * vertex i considers the communities of its neighbors plus its own and
 * adopts the candidate c maximizing the modularity gain of placing i
 * in c with everything else fixed — restricted by the ALTERNATING
 * DIRECTION rule: odd rounds admit only communities ordering at or
 * below i's current one, even rounds only at or above. Unrestricted
 * synchronous moves oscillate (two vertices can swap into each other's
 * community forever — a period-2 cycle this operator's spec reproduces
 * by hand); one-direction-per-round makes a swap impossible since it
 * would need a down-move and an up-move in the same round. The same
 * oscillation-breaking idea appears in distributed Louvain
 * implementations (e.g. Sotera's Giraph DGA). With integer degrees the
 * argmax of
 * ΔQ = e(i,c)/m − deg(i)·Σtot(c∖i)/(2m²) is the argmax of the INTEGER
 *
 *   gain(i,c) = 2m·e(i,c) − deg(i)·(Σtot(c) − [c = own]·deg(i))
 *
 * so the winner rule (max gain, ties to the smallest community id
 * under Spark's ordering) involves no floating point at all — the
 * distributed path, the driver tail, and a SQL oracle replay
 * bit-identically. Long arithmetic bounds |gain| ≤ (2m)²: exact up to
 * m ≈ 1.5e9 undirected edges, enforced loudly (beyond that, scoring
 * would need decimal math — fail rather than silently overflow).
 *
 * Scale: per round one edge→state hash join + one (vertex, community)
 * count aggregation + one per-community degree sum (broadcast-sized:
 * ≤ one row per community) + one row_number window partitioned by
 * vertex — all key-partitioned shuffles, no cartesian, state one row
 * per vertex. Rounds run through the [[IterationManager]]; below the
 * shared small-graph threshold a bounded driver tail replays the
 * identical trajectory (docs/THRESHOLDS.md row 2).
 */
class Louvain(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var maxIterV: Int = 4
  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)

  def maxIter(n: Int): this.type = { maxIterV = n; this }
  /** EDGE-count threshold for the bounded driver tail (0 disables);
   * docs/THRESHOLDS.md row 2. The tail replays the exact distributed
   * trajectory (same integer gains, same smallest-community tie rule
   * via the id type's Spark ordering). */
  def setSmallGraphThreshold(n: Long): this.type = { smallGraphThresholdV = n; this }

  /** Returns vertices + `community` (typed like `id`). */
  def run(): DataFrame = {
    val und = g.edges.select(col(SRC), col(DST))
      .filter(col(SRC).isNotNull && col(DST).isNotNull && col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as("a"), greatest(col(SRC), col(DST)).as("b"))
      .distinct()
      // endpoints absent from the vertex table carry no state: drop the edge
      .join(g.vertices.select(col(ID).as("a")), Seq("a"), "left_semi")
      .join(g.vertices.select(col(ID).as("b")), Seq("b"), "left_semi")
      .persist()
    val m = und.count()
    if (m == 0) {
      und.unpersist(false)
      return g.vertices.withColumn("community", col(ID))
    }
    require(2 * m <= 1500000000L,
      s"louvain: $m undirected edges exceeds the exact-Long gain bound " +
        "(|gain| <= (2m)^2 must fit a 64-bit integer, m <= 1.5e9); " +
        "partition the graph or reduce it before community detection")
    val ordOpt = UnionFind.sparkOrdering(g.vertices.schema(ID).dataType)
    if (smallGraphThresholdV > 0 && m <= smallGraphThresholdV && ordOpt.isDefined) {
      val r = runLocal(und, ordOpt.get)
      und.unpersist(false)
      return r
    }

    val u = und.select(col("a").as("s"), col("b").as("d"))
      .unionByName(und.select(col("b").as("s"), col("a").as("d")))
    val deg = u.groupBy(col("s").as(ID)).agg(count(lit(1)).as("deg"))
    val mgr = new IterationManager(2)
    var state = mgr.cycle(
      g.vertices.select(col(ID))
        .join(deg, Seq(ID), "left_outer")
        .select(col(ID), coalesce(col("deg"), lit(0L)).as("deg"),
          col(ID).as("community")),
      0)
    for (round <- 1 to maxIterV) {
      // Σtot per community: ≤ one row per community, broadcast-sized
      val tot = state.groupBy(col("community").as("nc")).agg(sum("deg").as("tot"))
      // e(i, c): edges from i into community c, plus a zero row for i's
      // own community so "stay" is always a candidate (and isolated
      // vertices keep a candidate at all)
      val nbr = u.join(state.select(col(ID).as("d"), col("community").as("nc")), Seq("d"))
        .select(col("s"), col("nc"), lit(1L).as("cnt"))
      val own = state.select(col(ID).as("s"), col("community").as("nc"), lit(0L).as("cnt"))
      val cand = nbr.unionByName(own).groupBy(col("s"), col("nc"))
        .agg(sum("cnt").as("e_ic"))
      val scored = cand
        .join(tot, Seq("nc"))
        .join(state.select(col(ID).as("s"), col("community").as("own"), col("deg")), Seq("s"))
        // alternating direction: odd rounds move down (or stay), even up
        .filter(if (round % 2 == 1) col("nc") <= col("own") else col("nc") >= col("own"))
        .withColumn("gain",
          lit(2 * m) * col("e_ic") -
            col("deg") * (col("tot") -
              when(col("nc") === col("own"), col("deg")).otherwise(lit(0L))))
      val w = Window.partitionBy(col("s")).orderBy(col("gain").desc, col("nc").asc)
      state = mgr.cycle(
        scored.withColumn("_rn", row_number().over(w)).filter(col("_rn") === 1)
          .select(col("s").as(ID), col("deg"), col("nc").as("community")),
        round)
    }
    val result = mgr.finish(
      g.vertices.join(state.select(col(ID), col("community")), Seq(ID), "left_outer")
        .withColumn("community", coalesce(col("community"), col(ID))))
    und.unpersist(false)
    result
  }

  /** Driver tail: the identical synchronous integer-gain rounds. */
  private def runLocal(und: DataFrame, ord: Ordering[Any]): DataFrame = {
    import scala.collection.mutable
    val edges: Array[(Any, Any)] = und.collect().iterator
      .map(r => (r.get(r.fieldIndex("a")), r.get(r.fieldIndex("b")))).toArray
    val vids: Array[Any] = edges.iterator.flatMap(p => Iterator(p._1, p._2))
      .toArray.distinct
    val m = edges.length.toLong
    val deg = mutable.HashMap.empty[Any, Long]
    vids.foreach(v => deg(v) = 0L)
    edges.foreach { case (a, b) => deg(a) += 1L; deg(b) += 1L }
    val adj = mutable.HashMap.empty[Any, mutable.ArrayBuffer[Any]]
    edges.foreach { case (a, b) =>
      adj.getOrElseUpdate(a, mutable.ArrayBuffer.empty) += b
      adj.getOrElseUpdate(b, mutable.ArrayBuffer.empty) += a
    }
    var com = mutable.HashMap.empty[Any, Any]
    vids.foreach(v => com(v) = v)
    for (round <- 1 to maxIterV) {
      val down = round % 2 == 1
      val tot = mutable.HashMap.empty[Any, Long]
      vids.foreach(v => tot(com(v)) = tot.getOrElse(com(v), 0L) + deg(v))
      val next = mutable.HashMap.empty[Any, Any]
      vids.foreach { v =>
        val e = mutable.HashMap.empty[Any, Long]
        e(com(v)) = 0L
        adj.getOrElse(v, mutable.ArrayBuffer.empty).foreach { n =>
          val c = com(n); e(c) = e.getOrElse(c, 0L) + 1L
        }
        var bestC: Any = null
        var bestG = Long.MinValue
        e.foreach { case (c, eic) =>
          // alternating direction, mirroring the distributed filter
          val admissible =
            if (down) ord.lteq(c, com(v)) else ord.gteq(c, com(v))
          if (admissible) {
            val gain = 2L * m * eic -
              deg(v) * (tot(c) - (if (c == com(v)) deg(v) else 0L))
            if (gain > bestG || (gain == bestG && ord.lt(c, bestC)))
              { bestC = c; bestG = gain }
          }
        }
        next(v) = bestC
      }
      com = next
    }
    // vertices touching no edge stay in their own community
    val spark = g.vertices.sparkSession
    val idField = g.vertices.schema(ID)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField(ID, idField.dataType, nullable = true),
      org.apache.spark.sql.types.StructField("community", idField.dataType, nullable = true)))
    val rel: java.util.List[org.apache.spark.sql.Row] = java.util.Arrays.asList(
      vids.map(v => org.apache.spark.sql.Row(v, com(v))): _*)
    g.vertices
      .join(broadcast(spark.createDataFrame(rel, schema)), Seq(ID), "left_outer")
      .withColumn("community", coalesce(col("community"), col(ID)))
  }
}
