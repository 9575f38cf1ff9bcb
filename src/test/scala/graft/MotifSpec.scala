package graft

import org.apache.spark.sql.functions._

class MotifSpec extends TestBase {
  import spark.implicits._

  test("join reorder: disconnected-in-user-order motif avoids the cartesian") {
    // user order puts (c)-[]->(d) before anything binds c — naive
    // left-to-right folding manifests an edges×edges cross join there
    val df = friends.find("(a)-[]->(b); (c)-[]->(d); (b)-[]->(c)")
    val ordered = friends.find("(a)-[]->(b); (b)-[]->(c); (c)-[]->(d)")
    assert(rows(df.select($"a.id", $"b.id", $"c.id", $"d.id")) ==
      rows(ordered.select($"a.id", $"b.id", $"c.id", $"d.id")))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "reorder failed to remove the cross join")
    // genuinely disconnected patterns still cross-join exactly as written
    val cross = friends.find("(a)-[e1]->(b); (c)-[e2]->(d)")
    assert(cross.count() == 64) // 8 edges squared
    // negation barrier: reorder must not move terms across the except
    val neg = friends.find("(a)-[]->(b); (c)-[]->(d); (b)-[]->(c); !(a)-[]->(d)")
    val negOrdered = friends.find("(a)-[]->(b); (b)-[]->(c); (c)-[]->(d); !(a)-[]->(d)")
    assert(rows(neg.select($"a.id", $"b.id", $"c.id", $"d.id")) ==
      rows(negOrdered.select($"a.id", $"b.id", $"c.id", $"d.id")))
  }

  test("single edge (a)-[e]->(b)") {
    val df = friends.find("(a)-[e]->(b)")
    assert(df.columns.toSeq == Seq("a", "e", "b"))
    assert(df.count() == 8)
  }

  test("mutual follows (a)-[e]->(b); (b)-[e2]->(a)") {
    val df = friends.find("(a)-[e]->(b); (b)-[e2]->(a)")
    val pairs = df.select($"a.id", $"b.id").as[(String, String)].collect().toSet
    assert(pairs == Set(("b", "c"), ("c", "b")))
  }

  test("chain of two (a)-[]->(b); (b)-[]->(c) drops anonymous edges") {
    val df = friends.find("(a)-[]->(b); (b)-[]->(c)")
    assert(df.columns.toSeq == Seq("a", "b", "c"))
    // paths of length 2: a->b->c, b->c->b, c->b->c, f->c->b, e->f->c,
    // e->d->a, d->a->b, d->a->e, a->e->f, a->e->d
    assert(df.count() == 10)
  }

  test("anonymous endpoint (a)-[]->() keeps edge count") {
    val df = friends.find("(a)-[]->()")
    assert(df.columns.toSeq == Seq("a"))
    assert(df.count() == 8)
  }

  test("backward arrow (a)<-[e]-(b) equals forward swapped") {
    val fwd = friends.find("(b)-[e]->(a)").select($"a.id", $"b.id")
      .as[(String, String)].collect().toSet
    val bwd = friends.find("(a)<-[e]-(b)").select($"a.id", $"b.id")
      .as[(String, String)].collect().toSet
    assert(fwd == bwd)
  }

  test("negation (a)-[]->(b); !(b)-[]->(a)") {
    val df = friends.find("(a)-[]->(b); !(b)-[]->(a)")
    val pairs = df.select($"a.id", $"b.id").as[(String, String)].collect().toSet
    // all 8 edges minus the mutual pair b<->c
    assert(pairs.size == 6)
    assert(!pairs.contains(("b", "c")) && !pairs.contains(("c", "b")))
  }

  test("negation-only vertex is bound positively: (a); !(a)-[]->(b)") {
    val df = friends.find("(a); !(a)-[]->(b)")
    // vertices with no outgoing edge to any b... b ranges over all vertices
    val as = df.select($"a.id").distinct().as[String].collect().toSet
    assert(as.contains("g")) // isolated vertex never has an out-edge
  }

  test("fixed-length (a)-[e*2]->(b) expands to 2-hop chain") {
    val df = chain(4).find("(a)-[e*2]->(b)")
    val pairs = df.select($"a.id", $"b.id").as[(Long, Long)].collect().toSet
    assert(pairs == Set((0L, 2L), (1L, 3L)))
    // the reference's user-visible naming contract: chain edges _e1.._en,
    // mid vertices _<src><dst><i>, in first-appearance order
    // (reference PatternMatchSuite.scala:586-595)
    assert(df.columns.toSeq == Seq("a", "_e1", "_ab1", "_e2", "b"))
    // the mid vertex is selectable, like any named vertex
    val mids = df.select($"_ab1.id").as[Long].collect().toSet
    assert(mids == Set(1L, 2L))
  }

  test("self-loop pattern (a)-[e]->(a)") {
    val v = Seq(1L, 2L).toDF("id")
    val e = Seq((1L, 1L), (1L, 2L)).toDF("src", "dst")
    val df = GraphFrame(v, e).find("(a)-[e]->(a)")
    assert(rows(df.select($"a.id")) == Set(Seq(1L)))
  }

  test("repeated vertex name constrains equality") {
    // triangle a->b->c->a on friends: d->a->e? no. Use cycle d->a->e->d? e->d,d->a,a->e: yes
    val df = friends.find("(x)-[]->(y); (y)-[]->(z); (z)-[]->(x)")
    val tri = df.select($"x.id", $"y.id", $"z.id").as[(String, String, String)]
      .collect().toSet
    assert(tri == Set(("a", "e", "d"), ("e", "d", "a"), ("d", "a", "e")))
  }

  test("invalid patterns rejected") {
    intercept[IllegalArgumentException](friends.find("(a)-[e]->(b); (c)-[e]->(d)"))
    intercept[IllegalArgumentException](friends.find("(a)-[a]->(b)"))
    intercept[IllegalArgumentException](friends.find("()-[]->()"))
    intercept[IllegalArgumentException](friends.find("(a)-[e]->"))
    intercept[IllegalArgumentException](friends.find("!(a)-[e]->(b)"))
  }

  test("lone vertex cross join (a); (b)") {
    val df = friends.find("(a); (b)")
    assert(df.count() == 49)
  }

  test("bidirectional (a)<-[e]->(b) requires both directed edges") {
    val df = friends.find("(a)<-[e]->(b)")
    val pairs = df.select($"a.id", $"b.id").as[(String, String)].collect().toSet
    assert(pairs == Set(("b", "c"), ("c", "b")))
    assert(df.columns.contains("e1") && df.columns.contains("e2"))
    intercept[IllegalArgumentException](friends.find("!(a)<-[e]->(b)"))
  }

  test("post-hoc filters on struct columns") {
    val df = friends.find("(a)-[e]->(b)")
      .filter($"e.relationship" === "follow" && $"a.age" < 35)
    val got = df.select($"a.id", $"b.id").as[(String, String)].collect().toSet
    assert(got == Set(("c", "b"), ("e", "f")))
  }

  test("motifs on an empty graph return empty results") {
    val g = GraphFrame(Seq.empty[Long].toDF("id"),
      Seq.empty[(Long, Long)].toDF("src", "dst"))
    assert(g.find("(a)-[e]->(b)").count() == 0)
    assert(g.find("(a)-[e]-(b)").count() == 0)
  }

  test("duplicate edges produce one row each") {
    val v = Seq(1L, 2L).toDF("id")
    val e = Seq((1L, 2L), (1L, 2L)).toDF("src", "dst")
    assert(GraphFrame(v, e).find("(a)-[e]->(b)").count() == 2)
  }

  test("chained var-length with other terms") {
    // friends of friends reachable in 1..2 hops that are not direct friends
    val df = chain(5).find("(a)-[e*1..2]->(b); (b)-[]->(c)")
    assert(df.columns.contains("c") && df.columns.contains("_hop"))
    val rows3 = df.select($"a.id", $"b.id", $"c.id", $"_hop")
      .as[(Long, Long, Long, Int)].collect().toSet
    assert(rows3.contains((0L, 1L, 2L, 1)))
    assert(rows3.contains((0L, 2L, 3L, 2)))
  }
}
