package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.GraphFrame

/**
 * Graph file sources (reference §2.1: LDBC `.v`/`.e` readers at
 * TestLDBCCases.scala:26-61, edge-list text loader at
 * graphx/.../GraphLoader.scala).
 *
 * All readers produce plain DataFrames through the parquet/csv/text
 * datasources, so column pruning and predicate pushdown behave exactly as
 * for any other table.
 */
object GraphLoader {

  /** Whitespace-delimited edge list (`src dst` per line, `#` comments).
   * Long vertex ids; lines with fewer than two fields are dropped. */
  def edgeListFile(spark: SparkSession, path: String,
      canonicalOrientation: Boolean = false): GraphFrame = {
    val parts = split(trim(col("value")), "\\s+")
    val e0 = spark.read.text(path)
      .filter(!col("value").startsWith("#") && length(trim(col("value"))) > 0)
      .select(element_at(parts, 1).cast("long").as(GraphFrame.SRC),
        element_at(parts, 2).cast("long").as(GraphFrame.DST))
      .filter(col(GraphFrame.SRC).isNotNull && col(GraphFrame.DST).isNotNull)
    val e = if (canonicalOrientation)
      e0.select(least(col(GraphFrame.SRC), col(GraphFrame.DST)).as(GraphFrame.SRC),
        greatest(col(GraphFrame.SRC), col(GraphFrame.DST)).as(GraphFrame.DST))
    else e0
    GraphFrame.fromEdges(e)
  }

  /** LDBC Graphalytics vertex file: one Long id per line. */
  def ldbcVertices(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(StructType(Seq(StructField(GraphFrame.ID, LongType))))
      .option("delimiter", " ").csv(path)

  /** LDBC Graphalytics edge file: space-delimited `src dst [weight]`. */
  def ldbcEdges(spark: SparkSession, path: String,
      weighted: Boolean = false, undirected: Boolean = false): DataFrame = {
    val base = StructType(Seq(
      StructField(GraphFrame.SRC, LongType), StructField(GraphFrame.DST, LongType)))
    val schema = if (weighted) base.add(GraphFrame.WEIGHT, DoubleType) else base
    val e = spark.read.schema(schema).option("delimiter", " ").csv(path)
    if (undirected)
      e.unionByName(e.withColumn("_t", col(GraphFrame.SRC))
        .withColumn(GraphFrame.SRC, col(GraphFrame.DST))
        .withColumn(GraphFrame.DST, col("_t")).drop("_t"))
    else e
  }

  /** LDBC graph from a directory of `<name>.v` / `<name>.e` files. */
  def ldbcGraph(spark: SparkSession, dir: String, name: String,
      weighted: Boolean = false, undirected: Boolean = false): GraphFrame =
    GraphFrame(ldbcVertices(spark, s"$dir/$name.v"),
      ldbcEdges(spark, s"$dir/$name.e", weighted, undirected))

  /** Two-directory parquet graph (the save format: vertices/ + edges/). */
  def parquetGraph(spark: SparkSession, dir: String): GraphFrame =
    GraphFrame(spark.read.parquet(s"$dir/vertices"), spark.read.parquet(s"$dir/edges"))

  /** Persist a graph as two parquet directories (round-trips with
   * [[parquetGraph]]; reference GraphFrameSuite.scala:316). */
  def saveParquetGraph(g: GraphFrame, dir: String): Unit = {
    g.vertices.write.mode("overwrite").parquet(s"$dir/vertices")
    g.edges.write.mode("overwrite").parquet(s"$dir/edges")
  }

  /** Graphviz DOT export as a DataFrame of lines: (section, sort_key,
   * line) — `section` 0=header, 1=nodes, 2=edges, 3=footer and `sort_key` a
   * within-section order, so `orderBy(section, sort_key)` (or a sorted
   * single-partition text write) emits a valid `digraph`. Ids are
   * double-quoted with backslash/quote escaping; every vertex gets a
   * node line (isolated vertices included), every edge an arrow line.
   * A pure projection + union — lines are produced distributed and only
   * ordered by the final writer. */
  def toDotLines(g: GraphFrame, name: String = "g"): DataFrame = {
    def quote(c: org.apache.spark.sql.Column) = concat(lit("\""),
      regexp_replace(regexp_replace(c.cast("string"), "\\\\", "\\\\\\\\"),
        "\"", "\\\\\""), lit("\""))
    val header = g.vertices.sparkSession.range(1)
      .select(lit(0).as("section"), lit("").as("sort_key"),
        lit(s"digraph $name {").as("line"))
    val nodes = g.vertices.select(lit(1).as("section"),
      col(GraphFrame.ID).cast("string").as("sort_key"),
      concat(lit("  "), quote(col(GraphFrame.ID)), lit(";")).as("line"))
    val edges = g.edges.select(lit(2).as("section"),
      concat_ws(" ", col(GraphFrame.SRC).cast("string"),
        col(GraphFrame.DST).cast("string")).as("sort_key"),
      concat(lit("  "), quote(col(GraphFrame.SRC)), lit(" -> "),
        quote(col(GraphFrame.DST)), lit(";")).as("line"))
    val footer = g.vertices.sparkSession.range(1)
      .select(lit(3).as("section"), lit("").as("sort_key"), lit("}").as("line"))
    header.unionByName(nodes).unionByName(edges).unionByName(footer)
  }

  /** GraphML export as a DataFrame of lines (same line-row contract as
   * [[toDotLines]]): (section, sort_key, line) with `section` 0=header,
   * 1=nodes, 2=edges, 3=footer — `orderBy(section, sort_key)` emits a
   * valid GraphML document (graphml.graphdrawing.org/primer; yEd/
   * NetworkX/igraph all read it). Ids are XML-escaped (& < > " ') and
   * every vertex gets a `<node>`, every edge an `<edge>`; `directed`
   * picks the `edgedefault`. Pure projection + union, produced
   * distributed and only ordered by the final writer. */
  def toGraphMLLines(g: GraphFrame, directed: Boolean = true): DataFrame = {
    def esc(c: org.apache.spark.sql.Column) =
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        regexp_replace(c.cast("string"), "&", "&amp;"),
        "<", "&lt;"), ">", "&gt;"), "\"", "&quot;"), "'", "&apos;")
    val spark = g.vertices.sparkSession
    import spark.implicits._
    val edgedefault = if (directed) "directed" else "undirected"
    val header = Seq(
      ("0", """<?xml version="1.0" encoding="UTF-8"?>"""),
      ("1", """<graphml xmlns="http://graphml.graphdrawing.org/xmlns">"""),
      ("2", s"""  <graph id="G" edgedefault="$edgedefault">"""))
      .toDF("sort_key", "line").select(lit(0).as("section"), col("sort_key"), col("line"))
    val nodes = g.vertices.select(lit(1).as("section"),
      col(GraphFrame.ID).cast("string").as("sort_key"),
      concat(lit("    <node id=\""), esc(col(GraphFrame.ID)), lit("\"/>")).as("line"))
    val edges = g.edges.select(lit(2).as("section"),
      concat_ws(" ", col(GraphFrame.SRC).cast("string"),
        col(GraphFrame.DST).cast("string")).as("sort_key"),
      concat(lit("    <edge source=\""), esc(col(GraphFrame.SRC)),
        lit("\" target=\""), esc(col(GraphFrame.DST)), lit("\"/>")).as("line"))
    val footer = Seq(("0", "  </graph>"), ("1", "</graphml>"))
      .toDF("sort_key", "line").select(lit(3).as("section"), col("sort_key"), col("line"))
    header.unionByName(nodes).unionByName(edges).unionByName(footer)
  }
}
