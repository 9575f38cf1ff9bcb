package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/**
 * Graft half of the side-by-side baseline against the reference engine
 * (BASELINE.md): identical protocol to the reference's JMH harness
 * (reference benchmarks/LDBCBenchmarkBase.scala:26-72 +
 * *Benchmark.scala) — Kryo, shuffle = 2*cpus, inputs persisted
 * MEMORY_AND_DISK_SER and pre-counted, per algorithm 1 warmup + 3 timed
 * runs (average of wall seconds), noop write sink — on the identical
 * graph: the long-id supplier→part→order trade graph derived from
 * lineitem at SPARK_GRAFT_SF_DIR.
 *
 * The reference half is the same driver body against
 * org.graphframes.GraphFrame (its core + vendored graphx compiled from
 * /root/reference against the stock Spark jars); see
 * tools/baseline_sidebyside.md for the recipe and measured numbers.
 */
object BaselineBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("GraftBaselineBench")
      .config("spark.sql.shuffle.partitions", (2 * cpus).toString)
      .config("spark.serializer", "org.apache.spark.serializer.KryoSerializer")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.sparkContext.setCheckpointDir("/tmp/graftbench-checkpoints")

    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val e = li.select(col("l_suppkey").cast("long").as(GraphFrame.SRC),
        (col("l_partkey").cast("long") + 100000L).as(GraphFrame.DST))
      .unionAll(li.select((col("l_partkey").cast("long") + 100000L).as(GraphFrame.SRC),
        (col("l_orderkey").cast("long") + 10000000L).as(GraphFrame.DST)))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK_SER)
    println(s"edges=${e.count()}")
    val v = e.select(col(GraphFrame.SRC).as(GraphFrame.ID))
      .unionAll(e.select(col(GraphFrame.DST).as(GraphFrame.ID)))
      .distinct().persist(StorageLevel.MEMORY_AND_DISK_SER)
    println(s"vertices=${v.count()}")
    val g = GraphFrame(v, e)

    def time3(name: String)(run: => Unit): (String, Double) = {
      run // warmup
      val ts = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); run; (System.nanoTime() - t0) / 1e9
      }
      name -> ts.sum / 3
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val results = Seq(
      time3("connected_components") {
        noop(g.connectedComponents.run())
      },
      time3("shortest_paths") {
        noop(g.shortestPaths.landmarks(Seq(1L)).run())
      },
      time3("label_propagation") {
        noop(g.labelPropagation.maxIter(10).run())
      })
    val qs = results.map { case (k, t) => "\"" + k + "\":" + t }.mkString("{", ",", "}")
    println(s"""GRAFTBENCH_JSON {"engine":"graft","sf":"$sfDir","cpus":$cpus,"queries":$qs}""")
    spark.stop()
  }
}
