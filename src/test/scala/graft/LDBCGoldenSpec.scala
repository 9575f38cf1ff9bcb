package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, LongType, StructField, StructType}

/**
 * LDBC Graphalytics golden-dataset validation, mirroring the reference's
 * methodology (reference TestLDBCCases.scala:22-232) without network:
 * checked-in LDBC-format fixtures (`<name>.v` / `<name>.e` /
 * `<name>.properties`) with expected `<name>-BFS/-CDLP/-WCC/-PR` files
 * computed INDEPENDENTLY of this engine:
 *  - `golden` — the 9-vertex two-component methodology pin (BFS/CDLP/WCC
 *    by hand; PR by direct evaluation of the LDBC recurrence, see
 *    tools/bench_notes_r8.md §4);
 *  - `golden2` — a 60-vertex three-component structure probe (24-spoke
 *    hub + 16-chain, 12-cycle, bridged triangles) generated with its
 *    expecteds by tools/make_ldbc_golden2.py (plain-Python BFS/CDLP/
 *    WCC/PR, no engine code).
 * Parameters are read from each properties file; comparison rules are
 * the reference's: exact equality for BFS distances (unreachable =
 * Long.MaxValue), CDLP communities and WCC components; |Δ| < 1e-4 on
 * sum-normalized ranks for PR.
 */
class LDBCGoldenSpec extends TestBase {

  private val unreachableID = 9223372036854775807L
  private val fixtures = Seq("golden", "golden2")

  private def res(fixture: String, name: String): String =
    getClass.getResource(s"/ldbc/$fixture/$name").getPath

  private def props(fixture: String): java.util.Properties = {
    val p = new java.util.Properties()
    val in = java.nio.file.Files.newInputStream(
      java.nio.file.Paths.get(res(fixture, s"$fixture.properties")))
    try p.load(in) finally in.close()
    p
  }

  private def expected(fixture: String, suffix: String, valueField: StructField): DataFrame =
    spark.read.option("delimiter", " ")
      .schema(StructType(Seq(StructField("id", LongType), valueField)))
      .csv(res(fixture, s"$fixture-$suffix"))

  // directed read for BFS (the algorithm runs undirected, like the
  // reference's test); symmetrized read for CDLP/WCC/PR
  private def gDirected(fixture: String): GraphFrame =
    sources.GraphLoader.ldbcGraph(spark,
      new java.io.File(res(fixture, s"$fixture.v")).getParent, fixture)
  private def gUndirected(fixture: String): GraphFrame =
    sources.GraphLoader.ldbcGraph(spark,
      new java.io.File(res(fixture, s"$fixture.v")).getParent, fixture,
      undirected = true)

  for (fixture <- fixtures) {

    test(s"LDBC $fixture: BFS distances from the properties-file source vertex") {
      val g = gDirected(fixture)
      val src = props(fixture).getProperty(s"graph.$fixture.bfs.source-vertex").toLong
      val got = g.shortestPaths.landmarks(Seq(src)).setDirected(false).run()
        .select(col("id"),
          element_at(col("distances"), src).cast(LongType).as("got"))
        .na.fill(Map("got" -> unreachableID))
      assert(got.count() == g.vertices.count())
      assert(got.join(expected(fixture, "BFS", StructField("distance", LongType)), Seq("id"))
        .filter(col("got") =!= col("distance")).isEmpty)
    }

    test(s"LDBC $fixture: CDLP communities at the properties-file iteration count") {
      val g = gUndirected(fixture)
      val iters = props(fixture).getProperty(s"graph.$fixture.cdlp.max-iterations").toInt
      val got = g.labelPropagation.maxIter(iters).run()
      assert(got.count() == g.vertices.count())
      assert(got.join(expected(fixture, "CDLP", StructField("community", LongType)), Seq("id"))
        .filter(col("label") =!= col("community")).isEmpty)
    }

    test(s"LDBC $fixture: WCC components (two_phase and randomized_contraction)") {
      val g = gUndirected(fixture)
      val exp = expected(fixture, "WCC", StructField("wcomp", LongType))
      for (algo <- Seq("two_phase", "randomized_contraction")) {
        var cc = g.connectedComponents.setAlgorithm(algo)
        if (algo == "randomized_contraction") cc = cc.setUseLabelsAsComponents(true)
        val got = cc.run()
        assert(got.count() == g.vertices.count(), algo)
        assert(got.join(exp, Seq("id"))
          .filter(col("component") =!= col("wcomp")).isEmpty, algo)
      }
    }

    test(s"LDBC $fixture: PageRank at the properties-file damping/iterations, " +
        "sum-normalized, 1e-4 tolerance") {
      val g = gUndirected(fixture)
      val p = props(fixture)
      val d = p.getProperty(s"graph.$fixture.pr.damping-factor").toDouble
      val iters = p.getProperty(s"graph.$fixture.pr.num-iterations").toInt
      val pr = g.pageRank.resetProbability(1.0 - d).maxIter(iters).run().vertices
      val total = pr.agg(sum("pagerank")).head().getDouble(0)
      val got = pr.withColumn("pagerank", col("pagerank") / lit(total))
      assert(got.count() == g.vertices.count())
      assert(got.join(expected(fixture, "PR", StructField("pr", DoubleType)), Seq("id"))
        .filter(abs(col("pagerank") - col("pr")) >= lit(1e-4)).isEmpty)
    }
  }
}
