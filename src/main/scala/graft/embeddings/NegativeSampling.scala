package graft.embeddings

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * Uniform NEGATIVE edge sampling for embedding / link-prediction
 * training (the negative half of the skip-gram objective — word2vec,
 * Mikolov et al. 2013; node2vec, Grover & Leskovec KDD'16 §3.2 train
 * against sampled non-edges): for every vertex, up to `k` vertices it
 * has NO edge to, drawn uniformly from the vertex set by deterministic
 * md5 draws — retry/AQE-safe and replayable bit-for-bit by a SQL
 * engine, the same determinism contract as [[graft.rw.RandomWalks]]'
 * md5 mode.
 *
 * Construction, every stage a hash join or aggregation:
 *  1. DENSE RANK 0..V−1 over the numeric vertex ids via the same
 *     distributed prefix sum as `packShards` (quantile buckets +
 *     broadcast bucket offsets — no global-order window, holds at any
 *     vertex count);
 *  2. `candidates` probes per vertex: probe j draws rank
 *     `md5(seed|src|j) mod V`, one equi-join back to the rank table
 *     maps rank → candidate id (uniform over vertices by construction);
 *  3. self-loops out, one anti-join against the edge set (both
 *     directions when `undirected`) removes true edges, duplicate
 *     draws keep the smallest j;
 *  4. per-vertex keep the first `k` surviving probes in draw order.
 *
 * Returns (src, dst, draw — the winning probe index, for audit). A
 * vertex adjacent to nearly everything (or a tiny graph) can yield
 * fewer than `k` negatives out of `candidates` probes — raise
 * `candidates` (expected shortfall decays geometrically in
 * candidates − k for non-pathological degree ratios); this is reported
 * honestly rather than resampled in a driver loop.
 *
 * Numeric vertex ids are REQUIRED (the dense rank orders by the id):
 * string-id graphs should mint surrogate ids first (the
 * `GraphFrame.indexedVertices` pattern) — failing loudly here beats a
 * silent non-replayable ordering.
 */
class NegativeSampling(g: GraphFrame) {
  import GraphFrame.{ID, SRC, DST}

  private var kV: Int = 5
  private var candidatesV: Int = 0 // 0 -> derived: 2k + 4
  private var seedV: Long = 42L
  private var undirectedV: Boolean = true

  /** Negatives to keep per vertex. */
  def setK(k: Int): this.type = {
    require(k >= 1, s"k must be >= 1, got $k"); kV = k; this
  }
  /** Probes drawn per vertex before filtering (default 2k + 4). */
  def setCandidates(c: Int): this.type = {
    require(c >= 1, s"candidates must be >= 1, got $c"); candidatesV = c; this
  }
  def setSeed(s: Long): this.type = { seedV = s; this }
  /** Treat edges as undirected when rejecting (default true): (u,v) is
   * disqualified if EITHER direction exists. */
  def setUndirected(u: Boolean): this.type = { undirectedV = u; this }

  /** 60-bit positive long from the leading 15 hex chars of md5 (the
   * RandomWalks draw, SQL-replayable as conv/from_hex on both engines). */
  private def md5Long(cols: org.apache.spark.sql.Column*) =
    conv(substring(md5(concat_ws("|", cols: _*)), 1, 15), 16, 10).cast("long")

  def run(): DataFrame = {
    require(g.vertices.schema(ID).dataType
        .isInstanceOf[org.apache.spark.sql.types.NumericType],
      "negativeSamples requires numeric vertex ids (the dense rank orders " +
        "by id); mint surrogate Long ids first for string-id graphs")
    val m = if (candidatesV > 0) candidatesV else 2 * kV + 4
    // dense rank 0..V-1 in id order — distributed prefix sum of 1s
    // consumed by the total-count action, the probe fan-out AND the
    // rank→candidate join — persist so the prefix sum runs once
    val ranked = graft.pipeline.Sampling.exclusivePrefixSum(
      g.vertices.select(col(ID), lit(1L).as("_one")),
      ID, "_one", 0, "negativeSamples")
      .select(col(ID), col("_off_excl").as("_rank"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val total = ranked.agg(coalesce(max(col("_rank")), lit(-1L)))
      .head().getLong(0) + 1L
    if (total <= 1L)
      return g.vertices.sparkSession.emptyDataFrame
        .select(lit(null).as(SRC), lit(null).as(DST), lit(0).as("draw"))
        .limit(0)
    val probes = ranked.select(col(ID).as(SRC))
      .withColumn("draw", explode(sequence(lit(1), lit(m))))
      .withColumn("_cand_rank",
        pmod(md5Long(lit(seedV), col(SRC).cast("string"), col("draw")), lit(total)))
    val withCand = probes.join(
        ranked.select(col("_rank").as("_cand_rank"), col(ID).as(DST)),
        "_cand_rank")
      .filter(col(SRC) =!= col(DST))
    val e = g.edges.select(col(SRC), col(DST))
    val rejected =
      if (undirectedV)
        e.unionByName(e.select(col(DST).as(SRC), col(SRC).as(DST))).distinct()
      else e.distinct()
    val nonEdges = withCand.join(rejected, Seq(SRC, DST), "left_anti")
      // duplicate draws of the same dst keep the smallest probe index
      .groupBy(col(SRC), col(DST)).agg(min(col("draw")).as("draw"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(SRC).orderBy(col("draw"), col(DST))
    nonEdges.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") <= kV)
      .select(col(SRC), col(DST), col("draw").cast("int").as("draw"))
  }
}
