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

  /** Cosine similarity of two array<double> columns (fold-based dot and
   * norms; stays inside codegen — no UDF). */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)
    val na = sqrt(aggregate(a, lit(0.0), (acc, v) => acc + v * v))
    val nb = sqrt(aggregate(b, lit(0.0), (acc, v) => acc + v * v))
    dot / (na * nb)
  }

  private def asDouble(c: Column): Column = c.cast("array<double>")

  /** All pairs (a < b) with cosine >= threshold: (a, b, cos rounded 4dp). */
  def bruteForcePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(col(idCol).as("_s_id"), asDouble(col(vecCol)).as("_s_v"))
    v.as("x").join(v.as("y"), col("x._s_id") < col("y._s_id"))
      .select(col("x._s_id").as("a"), col("y._s_id").as("b"),
        round(cosine(col("x._s_v"), col("y._s_v")), 4).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Exact top-k neighbors for each query row (optionally restricted by
   * `queryFilter`): (query_id, neighbor_id, rnk), ordered by
   * (cosine desc, neighbor id asc) for determinism. */
  def topK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      queryFilter: Column = lit(true)): DataFrame = {
    val v = df.select(col(idCol).as("_s_id"), asDouble(col(vecCol)).as("_s_v"))
    val q = df.filter(queryFilter)
      .select(col(idCol).as("_q_id"), asDouble(col(vecCol)).as("_q_v"))
    val scored = q.join(v, col("_q_id") =!= col("_s_id"))
      .select(col("_q_id").as("query_id"), col("_s_id").as("neighbor_id"),
        cosine(col("_q_v"), col("_s_v")).as("_cos"))
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

  /** Scale path: ANN top-k searched only within hyperplane-LSH buckets.
   * Recall < 1 by construction; bucket fan-out replaces the full O(n²). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String, k: Int,
      planes: Int = 12, dim: Int = 64): DataFrame = {
    val v = df.select(col(idCol).as("_s_id"), asDouble(col(vecCol)).as("_s_v"))
      .withColumn("_bucket", hyperplaneSignature(col("_s_v"), planes, dim))
    val scored = v.as("x").join(v.as("y"),
        col("x._bucket") === col("y._bucket") && col("x._s_id") =!= col("y._s_id"))
      .select(col("x._s_id").as("query_id"), col("y._s_id").as("neighbor_id"),
        cosine(col("x._s_v"), col("y._s_v")).as("_cos"))
    val w = Window.partitionBy("query_id").orderBy(col("_cos").desc, col("neighbor_id").asc)
    scored.withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("query_id"), col("neighbor_id"), col("rnk"))
  }
}
