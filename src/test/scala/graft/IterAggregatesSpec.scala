package graft

import scala.util.Random

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.expressions.IterAggregates

/** Differential tests for the bounded-buffer Pregel combine aggregates:
 * each must agree exactly with the collect_list-fold formulation it
 * replaced, across multiple partitions (exercising update, merge AND the
 * serialize/deserialize leg that partial aggregation ships between map
 * and reduce sides). */
class IterAggregatesSpec extends TestBase {
  import spark.implicits._

  private val rng = new Random(7)

  test("graft_array_sum matches the zip_with fold across partitions") {
    val width = 5
    val rows = (1 to 400).map { i =>
      (i % 13, Seq.fill(width)(rng.nextInt(100).toDouble))
    }
    val df = rows.toDF("k", "v").repartition(7)

    val fast = df.groupBy("k").agg(IterAggregates.arraySum(col("v")).as("s"))
    val slow = df.groupBy("k").agg(
      aggregate(collect_list(col("v")),
        typedlit(Seq.fill(width)(0.0)),
        (acc, m) => zip_with(acc, m, (a, b) => a + b)).as("s"))

    val f = fast.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    val s = slow.collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
    assert(f === s)
  }

  test("graft_array_sum skips nulls and is SQL-registered") {
    val df = Seq(
      (1, Some(Seq(1.0, 2.0))),
      (1, None),
      (1, Some(Seq(10.0, 20.0))),
      (2, None)).toDF("k", "v")
    df.createOrReplaceTempView("ias_t")
    GraftExtensions.register(spark)
    val out = spark.sql("SELECT k, graft_array_sum(v) AS s FROM ias_t GROUP BY k ORDER BY k")
      .collect()
    assert(out(0).getSeq[Double](1) === Seq(11.0, 22.0))
    assert(out(1).isNullAt(1)) // all-null group -> null, like sum()
  }

  test("graft_map_min matches the map_zip_with least fold, string keys") {
    val landmarks = Seq("a", "b", "c", "d")
    val rows = (1 to 300).map { i =>
      val m = landmarks.filter(_ => rng.nextBoolean())
        .map(l => l -> rng.nextInt(50)).toMap
      (i % 11, m)
    }
    val df = rows.toDF("k", "m").repartition(5)

    val emptyMap = map().cast("map<string,int>")
    val fast = df.groupBy("k").agg(IterAggregates.mapMin(col("m")).as("m"))
    val slow = df.groupBy("k").agg(
      aggregate(collect_list(col("m")), emptyMap,
        (acc, m) => map_zip_with(acc, m, (_, v1, v2) => least(v1, v2))).as("m"))

    val f = fast.collect().map(r => r.getInt(0) -> r.getMap[String, Int](1).toMap).toMap
    val s = slow.collect().map(r => r.getInt(0) -> r.getMap[String, Int](1).toMap).toMap
    assert(f === s)
  }

  test("graft_map_min long keys via SQL registration") {
    GraftExtensions.register(spark)
    val df = Seq(
      (1, Map(10L -> 3, 20L -> 7)),
      (1, Map(10L -> 1)),
      (1, Map(30L -> 9))).toDF("k", "m")
    df.createOrReplaceTempView("imm_t")
    val out = spark.sql("SELECT graft_map_min(m) AS m FROM imm_t GROUP BY k").collect()
    assert(out.head.getMap[Long, Int](0).toMap === Map(10L -> 1, 20L -> 7, 30L -> 9))
  }

  test("graft_lane_sum via SQL: scatter-add into a dense vector, literal dim") {
    GraftExtensions.register(spark)
    val df = Seq((1, 0, 1.5), (1, 2, 2.5), (1, 0, 3.0), (2, 1, 4.0))
      .toDF("k", "lane", "v")
    df.createOrReplaceTempView("ils_t")
    val out = spark.sql(
      "SELECT k, graft_lane_sum(lane, v, 3) AS s FROM ils_t GROUP BY k ORDER BY k")
      .collect()
    assert(out(0).getSeq[Double](1) === Seq(4.5, 0.0, 2.5))
    assert(out(1).getSeq[Double](1) === Seq(0.0, 4.0, 0.0))
    intercept[Exception] { // non-literal dim fails loudly
      spark.sql("SELECT graft_lane_sum(lane, v, lane) FROM ils_t").collect()
    }
  }

  test("graft_hindex matches the sorted-scan h-index across partitions") {
    def naive(vs: Seq[Int]): Int = {
      val sorted = vs.sorted(Ordering[Int].reverse)
      sorted.zipWithIndex.map { case (v, i) => math.min(v, i + 1) }
        .foldLeft(0)(math.max)
    }
    val rows = (1 to 500).map(i => (i % 17, rng.nextInt(30)))
    val df = rows.toDF("k", "v").repartition(9)
    val out = df.groupBy("k").agg(IterAggregates.hIndex(col("v")).as("h"))
      .collect().map(r => r.getInt(0) -> r.getInt(1)).toMap
    val expected = rows.groupBy(_._1).map { case (k, vs) => k -> naive(vs.map(_._2)) }
    assert(out === expected)
  }

  test("graft_hindex agrees with the KCoreMerge kernel on clamped inputs") {
    GraftExtensions.register(spark)
    // KCoreMerge(list, cap) == hindex over min(value, cap)
    val caps = Seq(0, 1, 3, 7, 100)
    caps.foreach { cap =>
      val vs = Seq.fill(40)(rng.nextInt(20))
      val viaList = spark.sql(
        s"SELECT graft_kcore_merge(array(${vs.mkString(",")}), $cap)").head().getInt(0)
      val clamped = vs.map(math.min(_, cap))
      val viaAgg = clamped.toDF("v")
        .agg(IterAggregates.hIndex(col("v"))).head().getInt(0)
      assert(viaAgg === viaList, s"cap=$cap vs=$vs")
    }
  }

  test("pppr/shortest-paths/kcore end-to-end on the friends graph") {
    // the three consumers still produce reference-checked results
    val g = examples.Graphs.friends
    val pppr = g.parallelPersonalizedPageRank
      .maxIter(10).sourceIds(Seq[Any]("a")).run().vertices
    val aRow = pppr.filter(col("id") === "a").head().getSeq[Double](
      pppr.columns.indexOf("pageranks"))
    assert(aRow.head > 0.15) // source keeps teleport mass

    val sp = g.shortestPaths.landmarks(Seq[Any]("a")).run()
    val dists = sp.select(col("id"), element_at(col("distances"), "a"))
      .collect().map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(dists("a") === Some(0))
    assert(dists("e") === Some(2)) // e->d->a? verify via edges: e-f, e-d; d-a
    assert(dists("g") === None)

    val kc = g.kCore.run()
    val cores = kc.select("id", "kcore").collect()
      .map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(cores.values.max >= 1)
    assert(cores("g") === 0) // isolated vertex
  }
}
