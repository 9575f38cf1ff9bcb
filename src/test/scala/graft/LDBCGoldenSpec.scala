package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, IntegerType, LongType, StructField, StructType}

/**
 * LDBC Graphalytics golden-dataset validation, mirroring the reference's
 * methodology (reference TestLDBCCases.scala:22-232) without network: a
 * checked-in LDBC-format fixture (`golden.v` / `golden.e` /
 * `golden.properties`) with expected `golden-BFS/-CDLP/-WCC/-PR` files
 * computed INDEPENDENTLY of this engine (BFS/CDLP/WCC by hand on the
 * 9-vertex two-component graph; PR by a direct evaluation of the LDBC
 * recurrence — see tools/bench_notes_r8.md). Parameters are read from the
 * properties file, comparison rules are the reference's: exact equality
 * for BFS distances (unreachable = Long.MaxValue), CDLP communities and
 * WCC components; |Δ| < 1e-4 on sum-normalized ranks for PR.
 */
class LDBCGoldenSpec extends TestBase {

  private val unreachableID = 9223372036854775807L
  private def res(name: String): String =
    getClass.getResource(s"/ldbc/golden/$name").getPath

  private lazy val props: java.util.Properties = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(java.nio.file.Paths.get(res("golden.properties")))
    try p.load(in) finally in.close()
    p
  }

  private def expected(name: String, valueField: StructField): DataFrame =
    spark.read.option("delimiter", " ")
      .schema(StructType(Seq(StructField("id", LongType), valueField)))
      .csv(res(name))

  // directed read for BFS (the algorithm runs undirected, like the
  // reference's test); symmetrized read for CDLP/WCC/PR
  private lazy val gDirected: GraphFrame =
    sources.GraphLoader.ldbcGraph(spark, new java.io.File(res("golden.v")).getParent, "golden")
  private lazy val gUndirected: GraphFrame =
    sources.GraphLoader.ldbcGraph(spark, new java.io.File(res("golden.v")).getParent, "golden",
      undirected = true)

  test("LDBC golden: BFS distances from the properties-file source vertex") {
    val src = props.getProperty("graph.golden.bfs.source-vertex").toLong
    val got = gDirected.shortestPaths.landmarks(Seq(src)).setDirected(false).run()
      .select(col("id"),
        element_at(col("distances"), src).cast(LongType).as("got"))
      .na.fill(Map("got" -> unreachableID))
    assert(got.count() == gDirected.vertices.count())
    assert(got.join(expected("golden-BFS", StructField("distance", LongType)), Seq("id"))
      .filter(col("got") =!= col("distance")).isEmpty)
  }

  test("LDBC golden: CDLP communities at the properties-file iteration count") {
    val iters = props.getProperty("graph.golden.cdlp.max-iterations").toInt
    val got = gUndirected.labelPropagation.maxIter(iters).run()
    assert(got.count() == gUndirected.vertices.count())
    assert(got.join(expected("golden-CDLP", StructField("community", LongType)), Seq("id"))
      .filter(col("label") =!= col("community")).isEmpty)
  }

  test("LDBC golden: WCC components (two_phase and randomized_contraction)") {
    val exp = expected("golden-WCC", StructField("wcomp", LongType))
    for (algo <- Seq("two_phase", "randomized_contraction")) {
      var cc = gUndirected.connectedComponents.setAlgorithm(algo)
      if (algo == "randomized_contraction") cc = cc.setUseLabelsAsComponents(true)
      val got = cc.run()
      assert(got.count() == gUndirected.vertices.count(), algo)
      assert(got.join(exp, Seq("id"))
        .filter(col("component") =!= col("wcomp")).isEmpty, algo)
    }
  }

  test("LDBC golden: PageRank at the properties-file damping/iterations, " +
      "sum-normalized, 1e-4 tolerance") {
    val d = props.getProperty("graph.golden.pr.damping-factor").toDouble
    val iters = props.getProperty("graph.golden.pr.num-iterations").toInt
    val pr = gUndirected.pageRank.resetProbability(1.0 - d).maxIter(iters).run().vertices
    val total = pr.agg(sum("pagerank")).head().getDouble(0)
    val got = pr.withColumn("pagerank", col("pagerank") / lit(total))
    assert(got.count() == gUndirected.vertices.count())
    assert(got.join(expected("golden-PR", StructField("pr", DoubleType)), Seq("id"))
      .filter(abs(col("pagerank") - col("pr")) >= lit(1e-4)).isEmpty)
  }
}
