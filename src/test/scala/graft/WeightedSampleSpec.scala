package graft

import graft.pipeline.Sampling

/** Efraimidis–Spirakis weighted sampling in ticket form: the spec replays
 * the md5 min-of-draws race locally (same 60-bit derivation) and demands
 * the exact winner set and ranks — the transcendental-free rule's whole
 * point is that any engine can do this. */
class WeightedSampleSpec extends TestBase {
  import spark.implicits._

  private def hex15(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Local replay of the race: per-id best ticket, then (key, id) top-k. */
  private def localWinners(weights: Map[Long, Long], k: Int,
      seed: Long = 42L): Seq[(Long, Int)] =
    weights.toSeq.collect { case (id, w) if w > 0 =>
      id -> (1L to w).map(j => hex15(s"$seed|$id|$j")).min
    }.sortBy { case (id, key) => (key, id) }
      .take(k).zipWithIndex.map { case ((id, _), i) => (id, i + 1) }

  private val weights: Map[Long, Long] =
    (1L to 30L).map(i => i -> (i % 7 + (if (i % 5 == 0) 0L else 1L))).toMap
  private val df = weights.toSeq.toDF("id", "w")

  test("winner set and ranks replay the md5 ticket race exactly") {
    val got = Sampling.weightedSample(df, "id", "w", k = 8)
      .select("id", "sample_rank").as[(Long, Int)].collect().toSeq.sorted
    assert(got == localWinners(weights, 8).sorted)
  }

  test("zero-weight rows never win; k larger than the eligible set returns all") {
    val eligible = weights.count(_._2 > 0)
    val out = Sampling.weightedSample(df, "id", "w", k = eligible + 10)
      .select("id").as[Long].collect().toSet
    assert(out == weights.filter(_._2 > 0).keySet)
  }

  test("deterministic under repartitioning; seed moves the draw") {
    def ids(d: org.apache.spark.sql.DataFrame, seed: Long) =
      Sampling.weightedSample(d, "id", "w", k = 6, seed = seed)
        .select("id").as[Long].collect().toSet
    val a = ids(df, 42L)
    assert(a == ids(df.repartition(11), 42L), "partitioning must not move the sample")
    assert(a != ids(df, 7L), "a different seed should draw differently")
  }

  test("maxWeight guard fails loudly; passthrough keeps original columns") {
    intercept[IllegalArgumentException] {
      Sampling.weightedSample(df.withColumn("w",
        org.apache.spark.sql.functions.lit(999999L)), "id", "w", k = 2)
    }
    val out = Sampling.weightedSample(df, "id", "w", k = 3)
    assert(out.columns.toSeq == Seq("id", "w", "sample_rank"))
  }

  test("inclusion odds track the weights (heavier id wins more seeds)") {
    // two rows, weights 9 vs 1: over 60 seeds the heavy row must take the
    // single slot far more often — a smoke check of the ∝w contract the
    // ticket-pooling argument proves exactly
    val two = Seq((1L, 9L), (2L, 1L)).toDF("id", "w")
    val wins = (1 to 60).map { s =>
      Sampling.weightedSample(two, "id", "w", k = 1, seed = s.toLong)
        .select("id").as[Long].head()
    }
    val heavy = wins.count(_ == 1L)
    assert(heavy > 40, s"heavy row won only $heavy/60 — odds look wrong")
  }
}
