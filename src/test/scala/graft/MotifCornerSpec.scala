package graft

import org.apache.spark.sql.functions._

/**
 * Motif corner cases ported (behaviorally) from the reference's
 * PatternMatchSuite (reference core/src/test/.../PatternMatchSuite.scala:
 * 83-636): same fixture graph, same pattern strings, same expected row
 * sets — this is where silent semantic divergence would hide. Fixed-length
 * expansion intermediates follow the reference's user-visible naming
 * (`_e1`, `_uv1`, ...; ParserContractSpec covers the contract); only the
 * both-endpoints-anonymous mids stay in the hidden `__tmpv` namespace.
 */
class MotifCornerSpec extends TestBase {
  import spark.implicits._

  // the reference suite's fixture (PatternMatchSuite.scala:44-61):
  // 0->1 friend, 1->0 follow, 1->2 friend, 2->3 follow, 2->0 unknown
  private lazy val v = Seq((0L, "a", "f"), (1L, "b", "m"), (2L, "c", "m"), (3L, "d", "f"))
    .toDF("id", "attr", "gender")
  private lazy val e = Seq((0L, 1L, "friend"), (1L, 0L, "follow"),
    (1L, 2L, "friend"), (2L, 3L, "follow"), (2L, 0L, "unknown"))
    .toDF("src", "dst", "relationship")
  private lazy val g = GraphFrame(v, e)
  private lazy val noEdges = v.select(col("id").as("src"))
    .crossJoin(v.select(col("id").as("dst")))
    .except(e.select("src", "dst"))

  private def ids(df: org.apache.spark.sql.DataFrame, cols: String*): Set[Seq[Long]] =
    df.select(cols.map(c => col(s"$c.id")): _*).collect()
      .map(r => (0 until cols.length).map(r.getLong)).toSet

  test("disconnected edges create an outer (cross) join") {
    val df = g.find("(a)-[]->(b); (c)-[]->(d)")
    assert(df.columns.toSeq == Seq("a", "b", "c", "d"))
    assert(df.count() == 25) // 5 edges squared, no duplicates
  }

  test("a->b->c but not c->a") {
    assert(ids(g.find("(a)-[]->(b); (b)-[]->(c); !(c)-[]->(a)"), "a", "b", "c") ==
      Set(Seq(0L, 1L, 0L), Seq(1L, 0L, 1L), Seq(1L, 2L, 3L)))
  }

  test("three connected vertices not in a triangle") {
    assert(ids(g.find("(u)-[]->(v); (v)-[]->(w); !(u)-[]->(w); !(w)-[]->(u)"),
      "u", "v", "w") ==
      Set(Seq(1L, 0L, 1L), Seq(0L, 1L, 0L), Seq(1L, 2L, 3L)))
  }

  test("a->b but not b->c: negated term binds a NEW vertex against all candidates") {
    assert(ids(g.find("(a)-[]->(b); !(b)-[]->(c)"), "a", "b", "c") == Set(
      Seq(0L, 1L, 1L), Seq(0L, 1L, 3L),
      Seq(1L, 0L, 0L), Seq(1L, 0L, 2L), Seq(1L, 0L, 3L),
      Seq(1L, 2L, 1L), Seq(1L, 2L, 2L),
      Seq(2L, 3L, 0L), Seq(2L, 3L, 1L), Seq(2L, 3L, 2L), Seq(2L, 3L, 3L),
      Seq(2L, 0L, 0L), Seq(2L, 0L, 2L), Seq(2L, 0L, 3L)))
  }

  test("a->b where b has no out edges: anonymous dst in negated term") {
    assert(ids(g.find("(a)-[]->(b); !(b)-[]->()"), "a", "b") == Set(Seq(2L, 3L)))
  }

  test("a->b but not c->d: fully detached negation crosses with non-edges") {
    val res = ids(g.find("(a)-[]->(b); !(c)-[]->(d)"), "a", "b", "c", "d")
    val expected = e.select(col("src").as("a"), col("dst").as("b"))
      .crossJoin(noEdges.select(col("src").as("c"), col("dst").as("d")))
      .collect().map(r => (0 until 4).map(r.getLong)).toSet
    assert(res == expected)
    assert(expected.size == noEdges.count() * e.count())
  }

  test("a->b, c where c has no out edges") {
    assert(ids(g.find("(a)-[]->(b); !(c)-[]->()"), "a", "b", "c") ==
      Set(Seq(0L, 1L, 3L), Seq(1L, 0L, 3L), Seq(1L, 2L, 3L),
        Seq(2L, 3L, 3L), Seq(2L, 0L, 3L)))
  }

  test("a->b, c without edges b->c and c->a (two negated terms share a new vertex)") {
    assert(ids(g.find("(a)-[]->(b); !(b)-[]->(c); !(c)-[]->(a)"), "a", "b", "c") == Set(
      Seq(0L, 1L, 3L),
      Seq(1L, 0L, 2L), Seq(1L, 0L, 3L),
      Seq(1L, 2L, 1L), Seq(1L, 2L, 2L),
      Seq(2L, 3L, 0L), Seq(2L, 3L, 2L), Seq(2L, 3L, 3L),
      Seq(2L, 0L, 0L), Seq(2L, 0L, 2L), Seq(2L, 0L, 3L)))
  }

  test("a->b, c, d with no edges a->c, c->d (chained negation-only vertices)") {
    val res = g.find("(a)-[]->(b); !(a)-[]->(c); !(c)-[]->(d)")
      .where("a.id = 0 AND a.id != b.id")
    assert(ids(res, "a", "b", "c", "d") == Set(
      Seq(0L, 1L, 0L, 0L), Seq(0L, 1L, 0L, 2L), Seq(0L, 1L, 0L, 3L),
      Seq(0L, 1L, 2L, 1L), Seq(0L, 1L, 2L, 2L),
      Seq(0L, 1L, 3L, 0L), Seq(0L, 1L, 3L, 1L), Seq(0L, 1L, 3L, 2L),
      Seq(0L, 1L, 3L, 3L)))
  }

  test("query without non-negated terms, one named vertex: !(v)-[]->()") {
    assert(ids(g.find("!(v)-[]->()"), "v") == Set(Seq(3L)))
  }

  test("query without non-negated terms, two named vertices: !(u)-[]->(v)") {
    val expected = noEdges.collect().map(r => Seq(r.getLong(0), r.getLong(1))).toSet
    assert(ids(g.find("!(u)-[]->(v)"), "u", "v") == expected)
  }

  test("named edge with anonymous src: ()-[e]->(v); !(v)-[]->()") {
    val res = g.find("()-[e]->(v); !(v)-[]->()")
      .select("e.src", "e.dst").as[(Long, Long)].collect().toSet
    assert(res == Set((2L, 3L)))
  }

  test("a->b but not a->b is empty (with and without edge name)") {
    assert(g.find("(a)-[]->(b); !(a)-[]->(b)").count() == 0)
    assert(g.find("(a)-[ab]->(b); !(a)-[]->(b)").count() == 0)
  }

  test("reserved __tmp names rejected loudly, never silently hidden") {
    val err = intercept[IllegalArgumentException](g.find("()-[__tmp]->(v); (v)-[]->(w)"))
    assert(err.getMessage.contains("__tmp"))
  }

  test("find column order follows first appearance") {
    val fof = g.find("(u)-[e]->(v); (v)-[]->(w); !(u)-[]->(w); !(w)-[]->(u)")
      .where("u.id != v.id AND v.id != w.id AND u.id != w.id")
    assert(fof.columns.toSeq == Seq("u", "e", "v", "w"))
    assert(ids(fof, "u", "v", "w") == Set(Seq(1L, 2L, 3L)))
    assert(g.find("(u)").columns.toSeq == Seq("u"))
    assert(g.find("(u)-[e2]->()").columns.toSeq == Seq("u", "e2"))
    assert(g.find("()-[e]->(w)").columns.toSeq == Seq("e", "w"))
  }

  test("invalid queries: negated named edges, name reuse, unbound var-length") {
    intercept[IllegalArgumentException](g.find("!()-[ab]->()"))
    intercept[IllegalArgumentException](g.find("(u)-[]->(v); !(a)-[ab]->(b)"))
    intercept[IllegalArgumentException](g.find("(u)-[ab]->(v); !(a)-[ab]->(b)"))
    intercept[IllegalArgumentException](g.find("(a)-[a]->(b)"))
    intercept[IllegalArgumentException](g.find("(a)-[]->(b); (c)-[a]->(d)"))
    intercept[IllegalArgumentException](g.find("(u)-[*..5]->(v)"))
  }

  test("fixed-length 3 equals fixed-length 2 chained with one edge") {
    def ends(p: String, u: String, vv: String): Seq[(Long, Long)] =
      g.find(p).where(s"$u.id == 0")
        .select(col(s"$u.id"), col(s"$vv.id")).as[(Long, Long)]
        .collect().toSeq.sorted
    val direct = ends("(u)-[*3]->(v)", "u", "v")
    val chainA = ends("(u)-[*2]->(v); (v)-[]->(k)", "u", "k")
    val chainB = ends("(u)-[]->(v); (v)-[*2]->(k)", "u", "k")
    assert(direct == chainA && direct == chainB)
    assert(direct.toSet == Set((0L, 0L), (0L, 3L), (0L, 1L)))
  }

  test("fixed-length 5 equals chained decompositions") {
    def ends(p: String, u: String, vv: String): Seq[(Long, Long)] =
      g.find(p).where(s"$u.id == 0")
        .select(col(s"$u.id"), col(s"$vv.id")).as[(Long, Long)]
        .collect().toSeq.sorted
    val direct = ends("(u)-[*5]->(v)", "u", "v")
    val two3 = ends("(u)-[*2]->(v); (v)-[*3]->(w)", "u", "w")
    val two2e = ends("(u)-[*2]->(v); (v)-[*2]->(w); (w)-[e]->(k)", "u", "k")
    assert(direct == two3 && direct == two2e)
  }

  test("var-length 2..2 equals fixed 2; 2..3 equals union of fixed 2 and 3") {
    def ends(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long)] =
      df.where("u.id == 0").select(col("u.id"), col("v.id"))
        .as[(Long, Long)].collect().toSeq.sorted
    assert(ends(g.find("(u)-[*2..2]->(v)")) == ends(g.find("(u)-[*2]->(v)")))
    val var23 = ends(g.find("(u)-[*2..3]->(v)"))
    val union = (ends(g.find("(u)-[*2]->(v)")) ++ ends(g.find("(u)-[*3]->(v)"))).sorted
    assert(var23 == union)
    // _hop marks which arm each row came from
    val hops = g.find("(u)-[*2..3]->(v)").select("_hop").distinct()
      .as[Int].collect().toSet
    assert(hops == Set(2, 3))
  }

  test("undirected edge, within a chain, and without a vertex name") {
    assert(ids(g.find("(u)-[]-(v)").where("u.id == 0"), "u", "v") ==
      Set(Seq(0L, 1L), Seq(0L, 2L)))
    // chain: undirected hop then directed hop
    val res = ids(g.find("(u)-[]-(v); (v)-[]->(w)").where("u.id == 0"), "u", "v", "w")
    assert(res == Set(Seq(0L, 1L, 0L), Seq(0L, 1L, 2L), Seq(0L, 2L, 3L), Seq(0L, 2L, 0L)))
    // no vertex name on one side
    assert(g.find("(u)-[]-()").where("u.id == 3").count() == 1) // only 2->3
    // _direction column present for undirected patterns
    assert(g.find("(u)-[]-(v)").columns.contains("_direction"))
  }

  test("undirected fixed-length (u)-[e*2]-(v): hand-checked rows, naming, " +
      "equivalence with var-length *2..2") {
    val fixed = g.find("(u)-[e*2]-(v)")
    assert(fixed.columns.contains("_direction"))
    assert(Seq("_uv1", "_e1", "_e2").forall(fixed.columns.contains))
    // vertex 3 touches only edge 2->3: both hops from 3 go through mid 2,
    // whose undirected neighbors are 1 (via 1->2), 3 (via 2->3), 0 (via 2->0)
    assert(ids(fixed.where("u.id == 3"), "u", "_uv1", "v") ==
      Set(Seq(3L, 2L, 1L), Seq(3L, 2L, 3L), Seq(3L, 2L, 0L)))
    // reference equivalence contract: fixed-length undirected == the
    // *n..n var-length undirected form (modulo the _hop tag)
    val varlen = g.find("(u)-[e*2..2]-(v)")
    assert(varlen.select("_hop").distinct().as[Int].collect().toSeq == Seq(2))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.select(col("u.id"), col("_uv1.id"), col("v.id"), col("_direction"))
        .collect().map(_.toString).sorted.toSeq
    assert(rows(fixed) == rows(varlen))
    // per-hop orientation tags: 2 hops -> "x;y" per row, both values used
    val dirs = fixed.select("_direction").distinct()
      .collect().map(_.getString(0)).toSet
    assert(dirs.subsetOf(Set("fwd;fwd", "fwd;rev", "rev;fwd", "rev;rev")))
    assert(dirs.size > 1)
  }

  test("stateful predicate: relationship chain filter") {
    // reference PatternMatchSuite.scala:816-851 uses a stateful UDF; the
    // same query is expressible with a post-hoc struct filter (our
    // documented preference — no UDF needed)
    val chained = g.find("(a)-[ab]->(b); (b)-[bc]->(c)")
      .where(col("ab.relationship") === "friend" && col("bc.relationship") === "friend")
    assert(ids(chained, "a", "b", "c") == Set(Seq(0L, 1L, 2L)))
  }
}
