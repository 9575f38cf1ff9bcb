package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Connected-components corner cases ported from the reference suite
 * (ConnectedComponentsSuite.scala:93-258), run against BOTH execution
 * paths (union-find fast path / distributed supersteps), plus a
 * determinism regression for the surrogate-id mint. */
class CCCornerSpec extends TestBase {
  import spark.implicits._

  private def bothPaths(g: GraphFrame): Seq[org.apache.spark.sql.DataFrame] =
    Seq(g.connectedComponents.run(),
      g.connectedComponents.setSmallGraphThreshold(0).run())

  private def partition(df: org.apache.spark.sql.DataFrame): Set[Set[String]] =
    df.select(col("id").cast("string"), col("component").cast("string"))
      .as[(String, String)].collect()
      .groupBy(_._2).values.map(_.map(_._1).toSet).toSet

  test("empty graph: zero components for int, long and string ids") {
    for (ids <- Seq(
        spark.createDataFrame(Seq.empty[Tuple1[Int]]).toDF("id"),
        spark.createDataFrame(Seq.empty[Tuple1[Long]]).toDF("id"),
        spark.createDataFrame(Seq.empty[Tuple1[String]]).toDF("id"))) {
      val e = ids.select(col("id").as("src"), col("id").as("dst"))
      for (cc <- bothPaths(GraphFrame(ids, e)))
        assert(cc.count() == 0L)
    }
  }

  test("single vertex keeps its attributes and gets a Long component") {
    val v = Seq((0L, "a", "b")).toDF("id", "vattr", "gender")
    val e = Seq((0L, 0L, 1L)).toDF("src", "dst", "test").filter("src > 10")
    for (cc <- bothPaths(GraphFrame(v, e))) {
      assert(cc.schema("component").dataType ==
        org.apache.spark.sql.types.LongType)
      assert(cc.select("id", "component", "vattr", "gender").collect().toSeq ==
        Seq(Row(0L, 0L, "a", "b")))
    }
  }

  test("disconnected vertices are all singletons") {
    val g = GraphFrame(spark.range(5).toDF("id"),
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    for (cc <- bothPaths(g))
      assert(partition(cc) == (0L until 5L).map(i => Set(i.toString)).toSet)
  }

  test("one component regardless of edge directions") {
    // reference: chain with alternating directions is still one component
    val v = (0L until 6L).toDF("id")
    val e = Seq((0L, 1L), (2L, 1L), (2L, 3L), (4L, 3L), (4L, 5L)).toDF("src", "dst")
    for (cc <- bothPaths(GraphFrame(v, e)))
      assert(partition(cc).size == 1)
  }

  test("two components and two dangling vertices") {
    val v = (0L until 8L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    for (cc <- bothPaths(GraphFrame(v, e)))
      assert(partition(cc) == Set(
        Set("0", "1", "2"), Set("3", "4", "5"), Set("6"), Set("7")))
  }

  test("really large long ids near Long.MaxValue") {
    val max = Long.MaxValue
    val g0 = chain(10)
    val v = g0.vertices.select((lit(max) - col("id")).as("id"))
    val e = g0.edges.select((lit(max) - col("src")).as("src"),
      (lit(max) - col("dst")).as("dst"))
    for (cc <- bothPaths(GraphFrame(v, e))) {
      assert(cc.count() == 10L)
      assert(cc.select("component").distinct().count() == 1L)
    }
  }

  test("self loops and duplicate edges do not split or merge components") {
    val v = (0L until 4L).toDF("id")
    val e = Seq((0L, 0L), (0L, 1L), (0L, 1L), (1L, 0L), (2L, 2L)).toDF("src", "dst")
    for (cc <- bothPaths(GraphFrame(v, e)))
      assert(partition(cc) == Set(Set("0", "1"), Set("2"), Set("3")))
  }

  // Round-6 regression: the surrogate mint must be a pure function of the
  // id VALUE. monotonically_increasing_id after a hash repartition varied
  // with AQE's runtime partition count, so indexedEdges' re-evaluation of
  // the indexedVertices plan could disagree with the cached label table —
  // silently splitting every component into singletons.
  test("surrogate ids are identical across independent evaluations") {
    val v = (0 until 500).map(i => Tuple1(s"node_$i")).toDF("id")
    val g = GraphFrame(v, v.select(col("id").as("src"), col("id").as("dst")))
    def mapping(): Map[String, Long] =
      g.indexedVertices.select(col("id"), col(GraphFrame.LONG_ID))
        .as[(String, Long)].collect().toMap
    val a = mapping()
    // second, independent evaluation of the same plan (no cache involved)
    val b = mapping()
    assert(a == b)
    assert(a.values.toSet.size == 500, "surrogates must be distinct")
  }

  test("string-id chain: fast path and distributed agree on the partition") {
    val n = 12
    val v = (0 until n).map(i => Tuple1(f"v$i%02d")).toDF("id")
    val e = (0 until n - 1).map(i => (f"v$i%02d", f"v${i + 1}%02d")).toDF("src", "dst")
    val g = GraphFrame(v, e)
    val fast = partition(g.connectedComponents.run())
    val dist = partition(g.connectedComponents.setSmallGraphThreshold(0).run())
    assert(fast == dist)
    assert(fast.size == 1)
  }
}
