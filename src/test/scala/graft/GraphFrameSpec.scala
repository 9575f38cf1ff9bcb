package graft

import org.apache.spark.sql.functions._

class GraphFrameSpec extends TestBase {
  import spark.implicits._

  test("construction requires id/src/dst columns") {
    val v = Seq((1L, "x")).toDF("id", "name")
    val e = Seq((1L, 1L)).toDF("src", "dst")
    GraphFrame(v, e) // ok
    intercept[IllegalArgumentException] {
      GraphFrame(v.withColumnRenamed("id", "vid"), e)
    }
    intercept[IllegalArgumentException] {
      GraphFrame(v, e.withColumnRenamed("dst", "to"))
    }
  }

  test("fromEdges derives the distinct vertex set") {
    val g = GraphFrame.fromEdges(Seq((1L, 2L), (2L, 3L), (1L, 2L)).toDF("src", "dst"))
    assert(rows(g.vertices) == Set(Seq(1L), Seq(2L), Seq(3L)))
  }

  test("validate rejects duplicate ids and dangling edges") {
    val dupV = Seq((1L, "x"), (1L, "y")).toDF("id", "name")
    val e = Seq((1L, 1L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { GraphFrame(dupV, e).validate() }
    val v = Seq((1L, "x")).toDF("id", "name")
    val danglingE = Seq((1L, 99L)).toDF("src", "dst")
    intercept[IllegalArgumentException] { GraphFrame(v, danglingE).validate() }
    friends.validate()
  }

  test("degrees on friends") {
    val out = friends.outDegrees.as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 2, "b" -> 1, "c" -> 1, "d" -> 1, "e" -> 2, "f" -> 1))
    val in = friends.inDegrees.as[(String, Int)].collect().toMap
    assert(in == Map("b" -> 2, "c" -> 2, "a" -> 1, "d" -> 1, "e" -> 1, "f" -> 1))
    val deg = friends.degrees.as[(String, Int)].collect().toMap
    assert(deg == Map("a" -> 3, "b" -> 3, "c" -> 3, "d" -> 2, "e" -> 3, "f" -> 2))
    // isolated vertex g appears in no degree table
    assert(!deg.contains("g"))
  }

  test("typeOutDegree pivots per edge type") {
    val t = friends.typeOutDegree("relationship", Seq("friend", "follow"))
    val a = t.filter($"id" === "a").select("outDegrees.friend", "outDegrees.follow")
      .as[(Int, Int)].head()
    assert(a == ((2, 0)))
    val e = t.filter($"id" === "e").select("outDegrees.friend", "outDegrees.follow")
      .as[(Int, Int)].head()
    assert(e == ((1, 1)))
  }

  test("triplets joins both endpoints") {
    val t = friends.triplets
    assert(t.count() == 8)
    val row = t.filter($"edge.relationship" === "friend" && $"src.id" === "d")
      .select($"src.name", $"dst.name").as[(String, String)].head()
    assert(row == (("David", "Alice")))
  }

  test("filterVertices drops dangling edges") {
    val g2 = friends.filterVertices($"age" > 30)
    assert(g2.vertices.count() == 5) // a,b,e,f,g
    // edges among {a,b,e,f}: a->b, e->f, a->e
    assert(g2.edges.count() == 3)
  }

  test("filterEdges keeps all vertices") {
    val g2 = friends.filterEdges($"relationship" === "friend")
    assert(g2.vertices.count() == 7)
    assert(g2.edges.count() == 4)
  }

  test("dropIsolatedVertices removes g") {
    val g2 = friends.dropIsolatedVertices()
    assert(rows(g2.vertices.select("id")) ==
      Set(Seq("a"), Seq("b"), Seq("c"), Seq("d"), Seq("e"), Seq("f")))
  }

  test("asUndirected doubles edges, asReversed flips") {
    assert(friends.asUndirected().edges.count() == 16)
    val rev = friends.asReversed()
    assert(rev.edges.filter($"src" === "b" && $"dst" === "a" &&
      $"relationship" === "friend").count() == 1)
  }

  test("surrogate ids are stable and join back") {
    val iv = friends.indexedVertices
    assert(iv.select("new_id").distinct().count() == 7)
    val ie = friends.indexedEdges
    assert(ie.count() == 8)
    // integral fast path
    val ch = chain(3)
    assert(rows(ch.indexedVertices.select("new_id", "id")) ==
      Set(Seq(0L, 0L), Seq(1L, 1L), Seq(2L, 2L)))
  }
}
