package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession + the reference's canonical test fixtures
 * (shapes per FIXTURES.md §1-2). */
trait TestBase extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = TestBase.session
  import spark.implicits._

  /** 7-vertex typed social graph; `g` (Gabby) is isolated. String ids
   * exercise the surrogate-Long indexing path. */
  lazy val friends: GraphFrame = {
    val v = Seq(
      ("a", "Alice", 34), ("b", "Bob", 36), ("c", "Charlie", 30),
      ("d", "David", 29), ("e", "Esther", 32), ("f", "Fanny", 36),
      ("g", "Gabby", 60)).toDF("id", "name", "age")
    val e = Seq(
      ("a", "b", "friend"), ("b", "c", "follow"), ("c", "b", "follow"),
      ("f", "c", "follow"), ("e", "f", "follow"), ("e", "d", "friend"),
      ("d", "a", "friend"), ("a", "e", "friend")).toDF("src", "dst", "relationship")
    GraphFrame(v, e)
  }

  /** Path graph 0 -> 1 -> ... -> n-1. */
  def chain(n: Int): GraphFrame = {
    val v = (0L until n.toLong).toDF("id")
    val e = (0L until (n - 1).toLong).map(i => (i, i + 1)).toDF("src", "dst")
    GraphFrame(v, e)
  }

  /** Star: 0 -> 1..n. */
  def star(n: Int): GraphFrame = {
    val v = (0L to n.toLong).toDF("id")
    val e = (1L to n.toLong).map(i => (0L, i)).toDF("src", "dst")
    GraphFrame(v, e)
  }

  /** Two n-cliques (ids 0..n-1 and n..2n-1) bridged by edge 0 -> 2n-1. */
  def twoBlobs(n: Int): GraphFrame = {
    val v = (0L until 2L * n).toDF("id")
    val blob1 = for (i <- 0L until n.toLong; j <- 0L until n.toLong if i != j) yield (i, j)
    val blob2 = blob1.map { case (s, d) => (s + n, d + n) }
    val e = (blob1 ++ blob2 :+ ((0L, 2L * n - 1))).toDF("src", "dst")
    GraphFrame(v, e)
  }

  def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet
}

object TestBase {
  @volatile private var current: SparkSession = _

  /** Shared suite session. Rebuilds if a suite with its own dedicated session
   * (e.g. GraftExtensionsSpec) stopped the underlying SparkContext. */
  def session: SparkSession = synchronized {
    if (current == null || current.sparkContext.isStopped) {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      current = SparkSession.builder()
        .master("local[4]")
        .appName("graft-test")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .getOrCreate()
      current.sparkContext.setLogLevel("ERROR")
    }
    current
  }
}
