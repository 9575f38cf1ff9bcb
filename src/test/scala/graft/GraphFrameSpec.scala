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

  test("toGraphX rejects null vertex ids and null edge endpoints (reference :716-761)") {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val vSchema = StructType(Seq(StructField("id", LongType, nullable = true),
      StructField("attr", StringType, nullable = true)))
    val vData = spark.sparkContext.parallelize(Seq(Row(1L, "a"), Row(null, "b")))
    val g1 = GraphFrame(spark.createDataFrame(vData, vSchema),
      Seq((1L, 1L, "friend")).toDF("src", "dst", "relationship"))
    val e1 = intercept[org.apache.spark.SparkException](g1.toGraphX.vertices.collect())
    assert(e1.getCause.isInstanceOf[IllegalArgumentException])
    assert(e1.getMessage.contains("Vertex ID cannot be null"))

    val eSchema = StructType(Seq(StructField("src", LongType, nullable = true),
      StructField("dst", LongType, nullable = true),
      StructField("relationship", StringType, nullable = true)))
    val eData = spark.sparkContext.parallelize(Seq(Row(1L, null, "friend")))
    val g2 = GraphFrame(Seq((1L, "a")).toDF("id", "attr"),
      spark.createDataFrame(eData, eSchema))
    val e2 = intercept[org.apache.spark.SparkException](g2.toGraphX.edges.collect())
    assert(e2.getCause.isInstanceOf[IllegalArgumentException])
    assert(e2.getMessage.contains("Edge") && e2.getMessage.contains("cannot be null"))
  }

  test("toGraphX round-trips Long, Int and String ids (reference :226-315)") {
    // Long ids: surrogates equal the original values
    val gx = friends.toGraphX
    assert(gx.vertices.count() == 7 && gx.edges.count() == 8)
    // Int ids pass through the integral fast path
    val gi = GraphFrame(Seq((1, "x"), (2, "y")).toDF("id", "n"),
      Seq((1, 2, 3.0)).toDF("src", "dst", "w"))
    val xi = gi.toGraphX
    assert(xi.vertices.collect().map(_._1).toSet == Set(1L, 2L))
    assert(xi.edges.collect().head.attr.getAs[Double]("w") == 3.0)
    // String ids go through value-pure surrogates; attr keeps the original id
    val ids = friends.toGraphX.vertices.collect()
      .map { case (_, attr) => attr.getAs[String]("id") }.toSet
    assert(ids == Set("a", "b", "c", "d", "e", "f", "g"))
    // and the edge attrs carry original endpoint ids for the reverse map
    val backs = friends.toGraphX.edges.collect()
      .map(e => (e.attr.getAs[String]("src"), e.attr.getAs[String]("dst"))).toSet
    assert(backs.contains(("a", "b")))
  }

  test("asUndirected and asReversed preserve edge attributes (reference :663-714, 763-775)") {
    val g = GraphFrame(Seq((1L, "a"), (2L, "b")).toDF("id", "name"),
      Seq((1L, 2L, "edge1")).toDF("src", "dst", "attr"))
    val und = g.asUndirected().edges.collect()
    assert(und.length == 2)
    assert(und.exists(r => r.getLong(0) == 1L && r.getLong(1) == 2L && r.getString(2) == "edge1"))
    assert(und.exists(r => r.getLong(0) == 2L && r.getLong(1) == 1L && r.getString(2) == "edge1"))
    val rev = g.asReversed().edges.collect()
    assert(rev.length == 1 &&
      rev.head.getLong(0) == 2L && rev.head.getLong(1) == 1L &&
      rev.head.getString(2) == "edge1")
  }

  test("fromEdges with a storage level persists the derived vertices (reference :187-199)") {
    import org.apache.spark.storage.StorageLevel
    val e = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val g = GraphFrame.fromEdges(e, StorageLevel.MEMORY_ONLY)
    try {
      assert(g.vertices.storageLevel === StorageLevel.MEMORY_ONLY)
      assert(g.vertices.count() === 3)
    } finally g.vertices.unpersist()
    // the 1-arg form stays lazy (no cache entry once the above unpersisted)
    assert(GraphFrame.fromEdges(e).vertices.storageLevel
      === StorageLevel.NONE)
  }

  test("vertexColumnMap / edgeColumnMap (reference :388, :406)") {
    assert(friends.vertexColumnMap === Map("id" -> 0, "name" -> 1, "age" -> 2))
    assert(friends.edgeColumnMap === Map("src" -> 0, "dst" -> 1, "relationship" -> 2))
  }

  test("findAugmentedPatterns is the find path (reference :659-674)") {
    val motif = "(a)-[e]->(b); !(c)-[]->(a)"
    val viaAlias = friends.findAugmentedPatterns(motif)
    val viaFind = friends.find(motif)
    assert(viaAlias.columns.toSeq === viaFind.columns.toSeq)
    assert(viaAlias.count() === viaFind.count())
  }

  test("findVarLengthPattern stacks hops with metadata (reference :625-657)") {
    import org.apache.spark.sql.functions.col
    val out = friends.findVarLengthPattern("a", "e", 1, 2, "out", "b")
    assert(out.columns.contains("_hop") && out.columns.contains("_pattern")
      && out.columns.contains("_direction"))
    assert(out.select("_direction").distinct().collect().map(_.getString(0)).toSeq
      === Seq("out"))
    val hop1 = friends.find("(a)-[e*1]->(b)").count()
    val hop2 = friends.find("(a)-[e*2]->(b)").count()
    assert(out.count() === hop1 + hop2)
    // empty direction adds the reversed orientation, same cardinality
    val both = friends.findVarLengthPattern("a", "e", 1, 2, "", "b")
    assert(both.count() === 2 * (hop1 + hop2))
    assert(both.select("_direction").distinct().count() === 2)
    assert(both.filter(col("_direction") === "in").count() === hop1 + hop2)
  }

  test("randomWalksBasedEmbedding aliases randomWalkEmbeddings (reference :976)") {
    val b = friends.randomWalksBasedEmbedding
    assert(b.isInstanceOf[embeddings.RandomWalkEmbeddings])
  }
}
