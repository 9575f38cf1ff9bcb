package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.GraphFrame
import graft.pipeline.{Dedup, Text}

/**
 * Runnable end-to-end demo of the training-data pipeline + graph layers:
 * quality-score a corpus, cluster near-duplicates (minhash → LSH →
 * distributed connected components), keep one document per cluster, then
 * analyze the entity graph of the surviving corpus.
 *
 *   sbt "runMain graft.examples.PipelineDemo [sfDir]"
 */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[8]"))
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = spark.read.parquet(s"$dir/documents.parquet")

    // 1. quality metrics + language id
    val quality = Text.quality(docs, "doc_id", "text")
    val lang = Text.languageId(docs, "doc_id", "text")
    println(s"docs: ${docs.count()}, low-quality (<20 tokens): " +
      quality.filter(col("n_tokens") < 20).count())
    lang.groupBy("pred_lang").count().orderBy(desc("count")).show(5, false)

    // 2. near-duplicate clustering (minhash LSH + connected components)
    val clusters = Dedup.nearDupClusters(docs, "doc_id", "text")
    val removed = clusters.filter(col("keep_id") =!= col("doc_id")).count()
    println(s"near-duplicate docs removed: $removed")

    // 3. graph analytics over the orders graph of the same scale factor
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val g = GraphFrame.fromEdges(orders.select(
      concat(lit("c"), col("o_custkey")).as("src"),
      concat(lit("o"), col("o_orderkey")).as("dst")))
    println(s"order graph components: " +
      g.connectedComponents.run().select("component").distinct().count())
    println("top customers by out-degree:")
    g.outDegrees.orderBy(desc("outDegree")).show(3, false)

    spark.stop()
  }
}
