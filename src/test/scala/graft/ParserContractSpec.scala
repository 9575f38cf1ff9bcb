package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.pattern._

/**
 * Port of the reference's pattern-parser contract (reference
 * core/src/test/.../pattern/PatternSuite.scala:25-282): accepted shapes,
 * the fixed-length rewrite's USER-VISIBLE generated names, backward/
 * bidirectional rewrites, and every rejected form. AST constructors differ
 * (our parser builds `EdgePattern(src, edge, dst)` rather than edge-classes
 * wrapping vertices), so structural cases assert on our AST and the naming
 * cases assert the exact generated names the reference exposes to users.
 */
class ParserContractSpec extends AnyFunSuite {
  private def p(s: String) = PatternParser.parse(s)

  test("good parses (reference PatternSuite:25-100)") {
    assert(p("(abc)") == Seq(VertexPattern(NamedVertex("abc"))))
    assert(p("(u)-[e]->(v)") ==
      Seq(EdgePattern(NamedVertex("u"), NamedEdge("e"), NamedVertex("v"))))
    // explicit *1 renames the edge, exactly like the reference
    assert(p("(u)-[e*1]->(v)") ==
      Seq(EdgePattern(NamedVertex("u"), NamedEdge("_e1"), NamedVertex("v"))))
    assert(p("(u)-[e*3]->(v)") == Seq(
      EdgePattern(NamedVertex("u"), NamedEdge("_e1"), NamedVertex("_uv1")),
      EdgePattern(NamedVertex("_uv1"), NamedEdge("_e2"), NamedVertex("_uv2")),
      EdgePattern(NamedVertex("_uv2"), NamedEdge("_e3"), NamedVertex("v"))))
    assert(p("(u)-[e*3]->(v);(v)-[l*2]->(w);(w)-[k*1]->(p)") == Seq(
      EdgePattern(NamedVertex("u"), NamedEdge("_e1"), NamedVertex("_uv1")),
      EdgePattern(NamedVertex("_uv1"), NamedEdge("_e2"), NamedVertex("_uv2")),
      EdgePattern(NamedVertex("_uv2"), NamedEdge("_e3"), NamedVertex("v")),
      EdgePattern(NamedVertex("v"), NamedEdge("_l1"), NamedVertex("_vw1")),
      EdgePattern(NamedVertex("_vw1"), NamedEdge("_l2"), NamedVertex("w")),
      EdgePattern(NamedVertex("w"), NamedEdge("_k1"), NamedVertex("p"))))
    assert(p("()-[]->(v)") ==
      Seq(EdgePattern(AnonymousVertex, AnonymousEdge, NamedVertex("v"))))
    assert(p("()-[e]->()") ==
      Seq(EdgePattern(AnonymousVertex, NamedEdge("e"), AnonymousVertex)))
    assert(p("(u)-[e]->(u)") ==
      Seq(EdgePattern(NamedVertex("u"), NamedEdge("e"), NamedVertex("u"))))
    assert(p("(u); ()-[]->(v)") == Seq(
      VertexPattern(NamedVertex("u")),
      EdgePattern(AnonymousVertex, AnonymousEdge, NamedVertex("v"))))
    assert(p("(u)-[]->(v); (v)-[]->(w); !(u)-[]->(w)") == Seq(
      EdgePattern(NamedVertex("u"), AnonymousEdge, NamedVertex("v")),
      EdgePattern(NamedVertex("v"), AnonymousEdge, NamedVertex("w")),
      Negation(EdgePattern(NamedVertex("u"), AnonymousEdge, NamedVertex("w")))))
    // anonymous fixed-length chains stay anonymous, mids named from endpoints
    assert(p("(u)-[*3]->(v)") == Seq(
      EdgePattern(NamedVertex("u"), AnonymousEdge, NamedVertex("_uv1")),
      EdgePattern(NamedVertex("_uv1"), AnonymousEdge, NamedVertex("_uv2")),
      EdgePattern(NamedVertex("_uv2"), AnonymousEdge, NamedVertex("v"))))
    assert(p("(u)-[*10]->(v)").length == 10)
    assert(p("(u)-[*10]->(v)")(9) ==
      EdgePattern(NamedVertex("_uv9"), AnonymousEdge, NamedVertex("v")))
    // one-sided anonymous endpoint: the empty name just drops out
    assert(p("()-[*2]->(v)") == Seq(
      EdgePattern(AnonymousVertex, AnonymousEdge, NamedVertex("_v1")),
      EdgePattern(NamedVertex("_v1"), AnonymousEdge, NamedVertex("v"))))
  }

  test("good parses - undirected (reference PatternSuite:107-117)") {
    assert(p("(u)-[e]-(v)") ==
      Seq(UndirectedEdgePattern(NamedVertex("u"), NamedEdge("e"), NamedVertex("v"))))
    assert(p("(u)-[e]-(v);(v)-[]-(k)") == Seq(
      UndirectedEdgePattern(NamedVertex("u"), NamedEdge("e"), NamedVertex("v")),
      UndirectedEdgePattern(NamedVertex("v"), AnonymousEdge, NamedVertex("k"))))
  }

  test("undirected fixed-length expands to an undirected chain with the " +
      "directed form's naming contract") {
    assert(p("(u)-[e*1]-(v)") ==
      Seq(UndirectedEdgePattern(NamedVertex("u"), NamedEdge("_e1"), NamedVertex("v"))))
    assert(p("(u)-[e*3]-(v)") == Seq(
      UndirectedEdgePattern(NamedVertex("u"), NamedEdge("_e1"), NamedVertex("_uv1")),
      UndirectedEdgePattern(NamedVertex("_uv1"), NamedEdge("_e2"), NamedVertex("_uv2")),
      UndirectedEdgePattern(NamedVertex("_uv2"), NamedEdge("_e3"), NamedVertex("v"))))
    assert(p("(u)-[*2]-(v)") == Seq(
      UndirectedEdgePattern(NamedVertex("u"), AnonymousEdge, NamedVertex("_uv1")),
      UndirectedEdgePattern(NamedVertex("_uv1"), AnonymousEdge, NamedVertex("v"))))
    intercept[IllegalArgumentException](p("(u)-[*0]-(v)"))
  }

  test("backward and bidirectional rewrites (reference PatternSuite:119-141)") {
    assert(p("(v)<-[e]-(u)") == p("(u)-[e]->(v)"))
    assert(p("(v)<-[]-(u)") == p("(u)-[]->(v)"))
    assert(p("!(v)<-[]-(u)") == p("!(u)-[]->(v)"))
    assert(p("()<-[e]-()") == p("()-[e]->()"))
    assert(p("(v)<-[*5]-(u)") == p("(u)-[*5]->(v)"))
    assert(p("(u)<-[]->(v)") == p("(u)-[]->(v);(v)-[]->(u)"))
    assert(p("(u)<-[e]->(v)") == p("(u)-[e1]->(v);(v)-[e2]->(u)"))
    // starred bidirectional duplicates the bracket content verbatim
    assert(p("(u)<-[*2]->(v)") == p("(u)-[*2]->(v);(v)-[*2]->(u)"))
  }

  test("bad parses (reference PatternSuite:143-228)") {
    val bad = Seq(
      "()",                      // lone anonymous vertex
      "(a)-[]->(b); ()",
      "(",
      "->(a)",
      "!(a)",                    // negated vertex
      "!(a)-[ab]->(b)",          // negated named edge
      "!()-[ab]->()",
      "!!(a)-[]->(b)",           // double negation
      "()-[]->()",               // fully anonymous
      "!()-[]->()",
      "()-[]-()",                // fully anonymous undirected
      "(a)-[]->(b); ()-[a]->()", // element name reuse across kinds
      "(a)-[a]->(b)",
      "(a)-[e]->(b); ()-[e]->()", // edge name reuse
      "!(u)<-[]->(v)",           // negated bidirectional
      "(u)-[*0]->(v)",           // zero hops
      "(u)-[*]->(v)")            // star without a count
    bad.foreach { s =>
      withClue(s"pattern '$s': ") {
        intercept[IllegalArgumentException](p(s))
      }
    }
  }

  test("empty pattern parses to nothing (reference PatternSuite:243-245)") {
    assert(p("").isEmpty)
  }
}
