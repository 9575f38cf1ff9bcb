package graft.lib

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Local community detection by personalized-PageRank sweep cut (engine
 * extension; the PageRank-Nibble recipe of Andersen–Chung–Lang, FOCS'06):
 * run PPR from a seed on the undirected graph, order vertices by the
 * degree-normalized score r(v)/d(v), and scan prefixes S_1 ⊆ S_2 ⊆ … of
 * that order, scoring each by conductance
 * `φ(S) = cut(S) / min(vol(S), 2m − vol(S))`; the sweep's argmin is the
 * seed's community. Answers "what cluster does THIS vertex belong to"
 * without clustering the whole graph — the local complement to Louvain.
 *
 * Exactness split: the ordering key is the PPR float (same fixed-round
 * recurrence as [[ParallelPersonalizedPageRank]], which this composes),
 * but every sweep quantity is exact integer arithmetic — vol is a prefix
 * sum of degrees, the internal-edge count arrives as one
 * `max(rank_a, rank_b)` histogram join (cut(S) = vol(S) − 2·e_in(S), so
 * NO per-prefix rescan of the edge list), and the single float division
 * per row is the identical nearest-double path a SQL replay takes.
 *
 * Scale: the PPR stage is the usual Pregel shape; the sweep is capped at
 * `sweepK` prefixes (local communities are small by intent — raise the
 * cap, not the algorithm), so the ordering is a distributed TakeOrdered
 * of k rows and every window below it ranks only those k survivors. One
 * extra equi-join of the edge list against the k ranked vertices
 * computes all k cuts at once. Output is ≤ sweepK rows, localCheckpointed
 * so callers never re-trigger the PPR lineage.
 */
class PPRSweep(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var sourceV: Option[Any] = None
  private var alphaV: Double = 0.15
  private var maxIterV: Int = 10
  private var sweepKV: Int = 15

  def source(s: Any): this.type = { sourceV = Some(s); this }
  def resetProbability(p: Double): this.type = {
    require(p > 0 && p < 1, s"resetProbability must be in (0,1): $p")
    alphaV = p; this }
  def maxIter(n: Int): this.type = {
    require(n >= 1, s"pprSweep needs maxIter >= 1: $n"); maxIterV = n; this }
  /** Number of sweep prefixes (= candidate community sizes) to score. */
  def sweepK(k: Int): this.type = {
    require(k >= 1, s"pprSweep needs sweepK >= 1: $k"); sweepKV = k; this }

  /** Returns the sweep table, one row per prefix rank 1..k:
   * `(rank, id, ppr, vol, cut, conductance, best)` — `best` marks the
   * argmin-conductance prefix(es); the community is the ids with
   * rank ≤ the best rank. A seed with no incident edge yields an empty
   * sweep (there is no community to find). */
  def run(): DataFrame = {
    require(sourceV.nonEmpty, "pprSweep: source required")
    val und = g.edges.select(col(SRC), col(DST))
      .filter(col(SRC).isNotNull && col(DST).isNotNull && col(SRC) =!= col(DST))
      .select(least(col(SRC), col(DST)).as("a"), greatest(col(SRC), col(DST)).as("b"))
      .distinct()
      .join(g.vertices.select(col(ID).as("a")), Seq("a"), "left_semi")
      .join(g.vertices.select(col(ID).as("b")), Seq("b"), "left_semi")
      .select(col("a"), col("b")) // USING-joins reorder; restore (a, b)
      .persist()
    val m = und.count()
    if (m == 0) {
      und.unpersist(false)
      return emptyResult()
    }
    val sym = und.select(col("a").as(SRC), col("b").as(DST))
      .unionByName(und.select(col("b").as(SRC), col("a").as(DST)))
    val deg = sym.groupBy(col(SRC).as(ID)).agg(count(lit(1)).as("_deg"))
    val gu = GraphFrame(g.vertices.select(col(ID)), sym)
    val pr = new ParallelPersonalizedPageRank(gu)
      .sourceIds(Seq(sourceV.get)).resetProbability(alphaV).maxIter(maxIterV)
      .run().vertices
      .select(col(ID), element_at(col("pageranks"), 1).as("ppr"))
    // degree-normalized order; the TakeOrdered cut bounds every window
    // below to <= sweepK rows. The key is QUANTIZED to 12 decimals:
    // structurally symmetric vertices are mathematical ties that float
    // sum-order perturbs at ~1e-16, and an unquantized sort would break
    // those ties differently per engine/run — 12dp is far above the
    // noise, far below any real score gap, and makes the id tie-break
    // the actual rule
    val ranked = pr.join(deg, Seq(ID))
      .filter(col("ppr") > 0)
      .select(col(ID), col("ppr"), col("_deg"),
        round(col("ppr") / col("_deg"), 12).as("_q"))
      .orderBy(col("_q").desc, col(ID).asc).limit(sweepKV)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("_q").desc, col(ID).asc)))
      .persist()
    val prefix = Window.orderBy("rank")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val einAt = und
      .join(ranked.select(col(ID).as("a"), col("rank").as("_ra")), Seq("a"))
      .join(ranked.select(col(ID).as("b"), col("rank").as("_rb")), Seq("b"))
      .select(greatest(col("_ra"), col("_rb")).as("rank"))
      .groupBy("rank").agg(count(lit(1)).as("_einAt"))
    val all = Window.partitionBy(lit(0))
    val swept = ranked.join(einAt, Seq("rank"), "left")
      .withColumn("vol", sum(col("_deg")).over(prefix))
      .withColumn("_ein", sum(coalesce(col("_einAt"), lit(0L))).over(prefix))
      .withColumn("cut", col("vol") - lit(2L) * col("_ein"))
      .withColumn("_den", least(col("vol"), lit(2L * m) - col("vol")))
      .withColumn("conductance",
        when(col("_den") > 0, col("cut").cast("double") / col("_den")))
      .withColumn("best",
        coalesce(col("conductance") === min(col("conductance")).over(all),
          lit(false)))
      .select(col("rank"), col(ID), col("ppr"), col("vol"), col("cut"),
        col("conductance"), col("best"))
    // <= sweepK rows — pin them so callers don't re-run the PPR lineage
    val out = swept.localCheckpoint()
    ranked.unpersist(false)
    und.unpersist(false)
    out
  }

  private def emptyResult(): DataFrame = {
    val idType = g.vertices.schema(ID).dataType
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("rank", IntegerType), StructField(ID, idType),
      StructField("ppr", DoubleType), StructField("vol", LongType),
      StructField("cut", LongType), StructField("conductance", DoubleType),
      StructField("best", BooleanType)))
    g.vertices.sparkSession.createDataFrame(
      java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema)
  }
}
