package graft.examples

import scala.reflect.runtime.universe.TypeTag
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraphFrame

/**
 * The reference's public example-graph fixtures (reference
 * examples/Graphs.scala:33-145) — user code imports these for demos and
 * tests, so they are part of the switchable API surface. Shapes and id
 * conventions match the reference exactly; `ALSSyntheticData` generates
 * its ratings deterministically instead of embedding the reference's
 * hardcoded csv blob (documented divergence — same schema and id
 * parity convention, different values).
 */
object Graphs {
  import GraphFrame.{ID, SRC, DST}

  private def spark: SparkSession = SparkSession.builder().getOrCreate()

  /** An empty GraphFrame of the given ID type. */
  def empty[T: TypeTag]: GraphFrame = {
    val s = spark
    import s.implicits._
    GraphFrame(Seq.empty[Tuple1[T]].toDF(ID), Seq.empty[(T, T)].toDF(SRC, DST))
  }

  /** Chain 0 -> 1 -> ... -> n-1 with Long ids. */
  def chain(n: Long): GraphFrame = {
    require(n >= 0, s"Chain graph size must be nonnegative but got $n.")
    GraphFrame(spark.range(n).toDF(ID),
      spark.range(n - 1L).toDF(ID).select(col(ID).as(SRC), (col(ID) + 1L).as(DST)))
  }

  /** The 7-person social graph every reference example uses. */
  def friends: GraphFrame = {
    val v = spark.createDataFrame(List(
      ("a", "Alice", 34), ("b", "Bob", 36), ("c", "Charlie", 30),
      ("d", "David", 29), ("e", "Esther", 32), ("f", "Fanny", 36),
      ("g", "Gabby", 60))).toDF("id", "name", "age")
    val e = spark.createDataFrame(List(
      ("a", "b", "friend"), ("b", "c", "follow"), ("c", "b", "follow"),
      ("f", "c", "follow"), ("e", "f", "follow"), ("e", "d", "friend"),
      ("d", "a", "friend"), ("a", "e", "friend"))).toDF("src", "dst", "relationship")
    GraphFrame(v, e)
  }

  /** Two complete blobs (0..n-1 and n..2n-1, self-loops included) bridged
   * by the single edge 0 -> n, with the reference's attribute columns. */
  def twoBlobs(blobSize: Int): GraphFrame = {
    val n = blobSize
    val edges1 = for (v1 <- 0 until n; v2 <- 0 until n)
      yield (v1.toLong, v2.toLong, s"$v1-$v2")
    val edges2 = for (v1 <- n until 2 * n; v2 <- n until 2 * n)
      yield (v1.toLong, v2.toLong, s"$v1-$v2")
    val edges = edges1 ++ edges2 ++ Seq((0L, n.toLong, s"0-$n"))
    val vertices = (0 until 2 * n).map(v => (v.toLong, s"$v", v))
    GraphFrame(
      spark.createDataFrame(vertices).toDF("id", "v_attr1", "v_attr2"),
      spark.createDataFrame(edges).toDF("src", "dst", "e_attr1"))
  }

  /** Star: root 0 with leaves 1..n, edges 0 -> leaf. */
  def star(n: Long): GraphFrame = {
    require(n >= 0L)
    GraphFrame(spark.range(n + 1L).toDF(ID),
      spark.range(1L, n + 1L).toDF(DST).withColumn(SRC, lit(0L)))
  }

  /** Bipartite user-item rating graph with the reference's id parity
   * convention (users = even ids, items = odd ids, `weight` = rating).
   * Ratings here are a deterministic hash function of (user, item)
   * rather than the reference's embedded csv. */
  def ALSSyntheticData(): GraphFrame = {
    val nUsers = 30L
    val nItems = 20L
    val ratings = spark.range(nUsers).select(col(ID).as("u"))
      .crossJoin(spark.range(nItems).select(col(ID).as("i")))
      // keep ~40% of pairs, rating 1..5 — both hash-derived, stable
      .filter(pmod(xxhash64(col("u"), col("i")), lit(5)) < 2)
      .select((col("u") * 2).as(SRC), (col("i") * 2 + 1).as(DST),
        (pmod(xxhash64(col("i"), col("u")), lit(5)) + 1).cast("double")
          .as(GraphFrame.WEIGHT))
    GraphFrame.fromEdges(ratings)
  }

  /** Grid Ising model (delegates to [[GridIsing.gridIsingModel]]). */
  def gridIsingModel(spark: SparkSession, n: Int, vStd: Double = 1.0,
      eStd: Double = 1.0): GraphFrame =
    GridIsing.gridIsingModel(spark, n, vStd, eStd)
}
