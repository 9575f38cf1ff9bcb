package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Independent-Cascade spread simulation (Kempe–Kleinberg–Tardos KDD'03)
 * under the LIVE-EDGE formulation: each edge flips ONE coin — it is
 * "live" with probability `p` — and the cascade from a seed set equals
 * directed reachability over the live subgraph (KKT §4's equivalence).
 * The coin is an md5 draw keyed (seed, src, dst), so the SAME cascade
 * materializes on any cluster, any retry, and a SQL engine replays it
 * bit-identically — this is the evaluation counterpart to
 * [[InfluenceMax]]: pick seeds with the optimizer, MEASURE their spread
 * here (one simulation per hash seed; average over seeds for a
 * Monte-Carlo estimate, each run deterministic).
 *
 * Plan: one codegen filter derives the live subgraph (no
 * materialization — the coin rides the edge scan), then BFS-style
 * frontier rounds: frontier ⋈ live-edges, anti-join vs activated,
 * min-agg per new vertex. Rounds ≤ the live subgraph's diameter;
 * lineage cut per round by the shared [[IterationManager]]. Returns
 * (id, round): activation round (0 = seed), null = never activated.
 *
 * Dyadic `p` (0.5, 0.25, 0.375 …) makes the threshold p·2⁶⁰ exact —
 * non-dyadic p works but pins the cascade to this engine's nearest
 * double (stated; the oracle embeds the same Long literal either way).
 */
class IndependentCascade(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var pV: Double = 0.1
  private var hashSeedV: Long = 42L
  private var maxIterV: Int = 50
  private var smallGraphThresholdV: Long =
    graft.GraftConf.linkAnalysisSmallGraphThreshold.getOrElse(100000L)

  /** Per-edge activation probability (default 0.1). */
  def p(x: Double): this.type = {
    require(x > 0 && x <= 1, s"p out of (0, 1]: $x"); pV = x; this
  }
  /** Hash seed for the edge coins — vary it for Monte-Carlo repeats. */
  def hashSeed(s: Long): this.type = { hashSeedV = s; this }
  def maxIter(n: Int): this.type = {
    require(n >= 1, s"maxIter must be >= 1: $n"); maxIterV = n; this
  }
  /** EDGE-count threshold for the bounded driver tail (0 disables).
   * Activation round is the unique live-edge BFS level, so the tail and
   * the distributed rounds agree exactly. */
  def setSmallGraphThreshold(n: Long): this.type = {
    smallGraphThresholdV = n; this
  }

  /** BFS levels CHAINED LAZILY per materialized round (default 1). The
   * activation round of a vertex is the unique live-edge BFS level — a
   * pure function of the coins — so k frontier expansions compose into
   * one plan; each cycle then pays ONE job + compile for k levels. Tree
   * growth is bounded per cycle (2^k copies of the previous CUT's
   * constant-size leaf; see TemporalReachability.hopsPerCycle for the
   * full rationale and the round-8 counter-experiment). Keep small (≤ 8);
   * the 25-vertex gate fixtures use 2 — k=4 MEASURED WORSE there (AQE
   * schedules extra stage-jobs and plan compile grows with the 2^k
   * tree; bench notes r13 §1). */
  def hopsPerCycle(k: Int): this.type = {
    require(k >= 1 && k <= 8, s"hopsPerCycle out of [1, 8]: $k")
    hopsPerCycleV = k; this
  }
  private var hopsPerCycleV: Int = 1

  /** 60-bit threshold: coin fires iff draw < p·2⁶⁰ (exact for dyadic p). */
  private def threshold: Long = (pV * (1L << 60).toDouble).toLong

  def run(seeds: Seq[Any]): DataFrame = {
    require(seeds.nonEmpty, "independentCascade requires a non-empty seed set")
    val coin = conv(substring(md5(concat_ws("|", lit(hashSeedV),
      col(SRC).cast("string"), col(DST).cast("string"))), 1, 15), 16, 10)
      .cast("long")
    val live = g.edges.select(col(SRC), col(DST))
      .filter(col(SRC) =!= col(DST))
      .filter(coin < threshold)
      .distinct()
      .persist()
    if (smallGraphThresholdV > 0 && live.count() <= smallGraphThresholdV) {
      val r = runLocal(live, seeds)
      live.unpersist(false)
      return r
    }
    // interval 1: every cycle cuts, with the growth count fused into the
    // cut's own job via cycleCounted — no separate limit/count action
    val mgr = new IterationManager(1)
    var state = mgr.cycle(g.vertices.select(col(ID),
      when(col(ID).isInCollection(seeds), lit(0))
        .otherwise(lit(null).cast("int")).as("round")), 0)
    var round = 0
    var grew = true
    var cycleIdx = 0
    while (round < maxIterV && grew) {
      cycleIdx += 1
      val k = math.min(hopsPerCycleV, maxIterV - round)
      var cur = state
      for (_ <- 1 to k) {
        round += 1
        val frontier = cur.filter(col("round") === (round - 1))
          .select(col(ID).as(SRC))
        val reached = live.join(frontier, SRC)
          .select(col(DST).as(ID)).distinct()
        cur = cur.join(reached.withColumn("_hit", lit(true)),
            Seq(ID), "left_outer")
          .select(col(ID),
            when(col("round").isNotNull, col("round"))
              .when(col("_hit"), lit(round))
              .otherwise(lit(null).cast("int")).as("round"))
      }
      // an empty LAST level means every later frontier is empty too —
      // intermediate levels of the batch may still have grown
      val (next, lastLevel) = mgr.cycleCounted(cur, cycleIdx,
        count(when(col("round") === round, lit(1))))
      grew = lastLevel > 0
      state = next
    }
    val result = mgr.finish(state)
    live.unpersist(false)
    result
  }

  /** Driver tail: plain BFS over the collected live edges — the level
   * assignment is unique, so no ordering requirement. */
  private def runLocal(live: DataFrame, seeds: Seq[Any]): DataFrame = {
    val adj = live.collect().groupBy(_.get(0)).map { case (u, rs) =>
      u -> rs.map(_.get(1)).toSeq
    }
    val round = scala.collection.mutable.HashMap.empty[Any, Int]
    seeds.foreach(s => round(s) = 0)
    var frontier: Seq[Any] = seeds.distinct
    var r = 0
    while (frontier.nonEmpty && r < maxIterV) {
      r += 1
      frontier = frontier.flatMap(u => adj.getOrElse(u, Nil))
        .distinct.filterNot(round.contains)
      frontier.foreach(v => round(v) = r)
    }
    val spark = g.vertices.sparkSession
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(
        round.toSeq.map { case (k, v) => org.apache.spark.sql.Row(k, v) }, 1),
      org.apache.spark.sql.types.StructType(Seq(
        g.vertices.schema(ID).copy(name = ID),
        org.apache.spark.sql.types.StructField("round",
          org.apache.spark.sql.types.IntegerType))))
    g.vertices.select(col(ID)).join(broadcast(df), Seq(ID), "left_outer")
  }
}
