package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Join
import org.apache.spark.sql.functions._

/** Motif vertex-join elimination under the referential-integrity contract.
 * The reference ships these assertions commented out — "Join elimination
 * will not work without Ankur's improved indexing" (reference
 * PatternMatchSuite.scala:851-874); here a compile-time contract
 * (`fromEdges` by construction / `validated()` / explicit assumption)
 * makes them pass. */
class MotifElisionSpec extends TestBase {
  import spark.implicits._

  private def joinCount(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case j: Join => j }.size

  private lazy val edgeDF = Seq(
    ("a", "b", "friend"), ("b", "c", "follow"), ("c", "b", "follow"),
    ("f", "c", "follow"), ("e", "f", "follow"), ("e", "d", "friend"),
    ("d", "a", "friend"), ("a", "e", "friend"), ("c", "a", "friend")
  ).toDF("src", "dst", "relationship")

  /** Same graph twice: with the contract (fromEdges) and without. */
  private lazy val gElided = GraphFrame.fromEdges(edgeDF)
  private lazy val gJoined = GraphFrame(gElided.vertices, edgeDF)

  test("join elimination - simple: (u)-[e]->(v) on a fromEdges graph has zero joins") {
    val res = gElided.find("(u)-[e]->(v)")
    assert(joinCount(res) == 0,
      s"expected a join-free plan:\n${res.queryExecution.optimizedPlan}")
    assert(rows(res) == rows(gJoined.find("(u)-[e]->(v)")))
  }

  test("join elimination - with keep: attribute graph + contract compiles to a bare edge scan") {
    val res = friends.assumeEdgesReferenceVertices.find("(u)-[e]->(v)", Seq("e"))
    assert(res.columns.toSeq == Seq("e"))
    assert(joinCount(res) == 0,
      s"expected a join-free plan:\n${res.queryExecution.optimizedPlan}")
    assert(rows(res) == rows(friends.find("(u)-[e]->(v)").select("e")))
  }

  test("triangle on a fromEdges graph: two edge-edge joins, no vertex joins") {
    val motif = "(a)-[e1]->(b); (b)-[e2]->(c); (c)-[e3]->(a)"
    val res = gElided.find(motif)
    assert(joinCount(res) == 2, s"plan:\n${res.queryExecution.optimizedPlan}")
    assert(rows(res) == rows(gJoined.find(motif)))
  }

  test("keep projection retains join constraints through a dropped middle vertex") {
    // b is dropped from the output but still binds e1.dst === e2.src
    val res = friends.assumeEdgesReferenceVertices
      .find("(a)-[e1]->(b); (b)-[e2]->(c)", Seq("a", "c"))
    assert(res.columns.toSeq == Seq("a", "c"))
    val expected = friends.find("(a)-[e1]->(b); (b)-[e2]->(c)").select("a", "c")
    assert(rows(res) == rows(expected))
    // only the edge-edge join and the two kept vertex joins remain
    assert(joinCount(res) == 3, s"plan:\n${res.queryExecution.optimizedPlan}")
  }

  test("elision preserves negation, undirected and var-length semantics") {
    for (motif <- Seq(
        "(a)-[]->(b); !(b)-[]->(a)",
        "(a)-[e]-(b)",
        "(a)-[e*1..2]->(b)",
        "(a)-[e]->(a)")) {
      assert(rows(gElided.find(motif)) == rows(gJoined.find(motif)), s"motif: $motif")
    }
  }

  test("without the contract, keep still filters dangling edges (joins kept)") {
    val v = Seq("a", "b").toDF("id")
    val e = Seq(("a", "b"), ("a", "zzz")).toDF("src", "dst") // zzz dangles
    val g = GraphFrame(v, e)
    val res = g.find("(u)-[e]->(v)", Seq("e"))
    assert(joinCount(res) > 0)
    assert(res.count() == 1) // the dangling edge is filtered, as always
    // asserting the contract trades that filter away — both rows surface
    assert(g.assumeEdgesReferenceVertices.find("(u)-[e]->(v)", Seq("e")).count() == 2)
  }

  test("validated() unlocks elision only on actually-consistent graphs") {
    val ok = GraphFrame(Seq("a", "b").toDF("id"),
      Seq(("a", "b")).toDF("src", "dst")).validated()
    assert(joinCount(ok.find("(u)-[e]->(v)")) == 0)
    val bad = GraphFrame(Seq("a").toDF("id"), Seq(("a", "zzz")).toDF("src", "dst"))
    intercept[IllegalArgumentException] { bad.validated() }
  }

  test("contract survives filterEdges/filterVertices/dropIsolatedVertices/asUndirected/asReversed") {
    val g2 = gElided.filterEdges(col("relationship") === "friend")
      .dropIsolatedVertices().asUndirected().asReversed()
    assert(joinCount(g2.find("(u)-[e]->(v)")) == 0)
    val g3 = gElided.filterVertices(col("id") =!= "a")
    // filterVertices itself semi-joins the edge table twice; the motif
    // must add NO joins on top of that edge frame
    assert(joinCount(g3.find("(u)-[e]->(v)")) == joinCount(g3.edges))
    val g3j = GraphFrame(gJoined.vertices, gJoined.edges)
      .filterVertices(col("id") =!= "a")
    assert(rows(g3.find("(u)-[e]->(v)")) == rows(g3j.find("(u)-[e]->(v)")))
  }

  test("null endpoints: elided plans filter them exactly like the join did") {
    val e = Seq(("a", "b"), ("a", null)).toDF("src", "dst")
    val v = Seq("a", "b").toDF("id")
    val withJoin = GraphFrame(v, e)
    val elided = withJoin.assumeEdgesReferenceVertices
    assert(rows(elided.find("(u)-[]->(v)", Seq("v"))) ==
      rows(withJoin.find("(u)-[]->(v)").select("v")))
    assert(elided.find("(u)-[]->(v)", Seq("v")).count() == 1)
  }

  test("zero-join triplets on a fromEdges graph") {
    val t = gElided.triplets
    assert(joinCount(t) == 0, s"plan:\n${t.queryExecution.optimizedPlan}")
    assert(rows(t) == rows(gJoined.triplets))
  }

  test("keep validates names and keeps _hop/_direction") {
    intercept[IllegalArgumentException] {
      friends.find("(u)-[e]->(v)", Seq("nope"))
    }
    val hops = gElided.find("(a)-[e*1..2]->(b)", Seq("a", "b"))
    assert(hops.columns.contains("_hop"))
    val undir = gElided.find("(a)-[e]-(b)", Seq("e"))
    assert(undir.columns.toSeq == Seq("e", "_direction"))
  }
}
