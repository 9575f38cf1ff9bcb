package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Embedding similarity search over an `array<float>` column.
 *
 * Brute-force cosine is the correctness baseline (O(n²) self-join — fine
 * for a broadcastable side); the LSH-bucketed variant is the scale path:
 * deterministic random-hyperplane signatures shrink the candidate set so
 * the quadratic join only runs inside buckets. Hyperplane weights are
 * md5-derived (±1 per (plane, dim)) — reproducible with no RNG state and
 * safe under task retries.
 */
object Similarity {
  import graft.expressions.ArrayDotProduct.dotProduct

  /** Cosine similarity of two array<double> columns via the native
   * [[graft.expressions.ArrayDotProduct]] kernel — no UDF, no
   * intermediate arrays, codegen'd primitive loops. */
  def cosine(a: Column, b: Column): Column =
    dotProduct(a, b) / (sqrt(dotProduct(a, a)) * sqrt(dotProduct(b, b)))

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** (_s_id, _s_v, _s_n): vectors with their norm precomputed once, so the
   * n² pair stage runs exactly one dot product per pair. */
  private def withNorm(df0: DataFrame, idCol: String, vecCol: String): DataFrame =
    ensureParallelism(df0).select(col(idCol).as("_s_id"), asDouble(col(vecCol)).as("_s_v"))
      .withColumn("_s_n", sqrt(dotProduct(col("_s_v"), col("_s_v"))))

  /** All pairs (a < b) with cosine >= threshold: (a, b, cos rounded 4dp). */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = withNorm(df, idCol, vecCol)
    v.as("x").join(v.as("y"), col("x._s_id") < col("y._s_id"))
      .select(col("x._s_id").as("a"), col("y._s_id").as("b"),
        round(dotProduct(col("x._s_v"), col("y._s_v")) / (col("x._s_n") * col("y._s_n")),
          4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact top-k neighbors for each query row (optionally restricted by
   * `queryFilter`): (query_id, neighbor_id, rnk), ordered by
   * (cosine desc, neighbor id asc) for determinism. */
  def topK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queryFilter: Column = lit(true)): DataFrame = {
    val v = withNorm(df, idCol, vecCol)
    val q = withNorm(df.filter(queryFilter), idCol, vecCol)
      .select(col("_s_id").as("_q_id"), col("_s_v").as("_q_v"), col("_s_n").as("_q_n"))
    val scored = q.join(v, col("_q_id") =!= col("_s_id"))
      .select(col("_q_id").as("query_id"), col("_s_id").as("neighbor_id"),
        (dotProduct(col("_q_v"), col("_s_v")) / (col("_q_n") * col("_s_n"))).as("_cos"))
    val w = Window.partitionBy("query_id").orderBy(col("_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Deterministic random-hyperplane signature: bit p of the signature is
   * the sign of Σ_i w(p,i)·v[i] with w(p,i) = ±1 from md5(p|i). */
  def hyperplaneSignature(vec: Column, planes: Int, dim: Int): Column = {
    val bits = (0 until planes).map { p =>
      val s = (0 until dim).map { i =>
        val sign = if (Integer.parseInt(
          java.security.MessageDigest.getInstance("MD5")
            .digest(s"$p|$i".getBytes("UTF-8")).take(1).map("%02x".format(_)).mkString, 16) % 2 == 0) 1.0 else -1.0
        element_at(vec, i + 1) * lit(sign)
      }.reduce(_ + _)
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** IVF (inverted-file) ANN: a deterministic coarse quantizer — the
   * `nlist` vectors with the smallest id-hash act as centroids — assigns
   * every vector to its nearest cell; queries probe their `nprobe`
   * nearest cells only. Candidate count drops from n to ~n·nprobe/nlist
   * per query, the classic IVF trade of recall for fan-out. */
  def ivfTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      nlist: Int = 16, nprobe: Int = 4): DataFrame = {
    val v = withNorm(df, idCol, vecCol)
    val cents = v.withColumn("_h", xxhash64(col("_s_id"))).orderBy("_h").limit(nlist)
      .select(col("_s_id").as("_c_id"), col("_s_v").as("_c_v"), col("_s_n").as("_c_n"))
    val sim = dotProduct(col("_s_v"), col("_c_v")) / (col("_s_n") * col("_c_n"))
    val assign = v.crossJoin(broadcast(cents)).withColumn("_sim", sim)
    val byVec = Window.partitionBy("_s_id").orderBy(col("_sim").desc, col("_c_id").asc)
    val ranked = assign.withColumn("_r", row_number().over(byVec))
    val data = ranked.filter(col("_r") === 1)
      .select(col("_s_id"), col("_s_v"), col("_s_n"), col("_c_id").as("_cell"))
    val queries = ranked.filter(col("_r") <= nprobe)
      .select(col("_s_id").as("_q_id"), col("_s_v").as("_q_v"),
        col("_s_n").as("_q_n"), col("_c_id").as("_cell"))
    val scored = queries.join(data, "_cell")
      .filter(col("_q_id") =!= col("_s_id"))
      .select(col("_q_id").as("query_id"), col("_s_id").as("neighbor_id"),
        (dotProduct(col("_q_v"), col("_s_v")) / (col("_q_n") * col("_s_n"))).as("_cos"))
    val w = Window.partitionBy("query_id").orderBy(col("_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }

  /** Scale path: ANN top-k searched only within hyperplane-LSH buckets.
   * Recall < 1 by construction; bucket fan-out replaces the full O(n²). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 12, dim: Int = 64): DataFrame = {
    val v = withNorm(df, idCol, vecCol)
      .withColumn("_bucket", hyperplaneSignature(col("_s_v"), planes, dim))
    val scored = v.as("x").join(v.as("y"),
        col("x._bucket") === col("y._bucket") && col("x._s_id") =!= col("y._s_id"))
      .select(col("x._s_id").as("query_id"), col("y._s_id").as("neighbor_id"),
        (dotProduct(col("x._s_v"), col("y._s_v")) / (col("x._s_n") * col("y._s_n"))).as("_cos"))
    val w = Window.partitionBy("query_id").orderBy(col("_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }
}
