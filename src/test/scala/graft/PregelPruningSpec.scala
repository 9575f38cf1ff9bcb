package graft

import org.apache.spark.sql.functions._

class PregelPruningSpec extends TestBase {
  import spark.implicits._
  import graft.lib.Pregel

  test("wide vertex attributes are pruned out of the triplet structs") {
    // vertices with a wide payload column the messages never touch
    val v = (0L until 4L).map(i => (i, "x" * 100, i * 2)).toDF("id", "wide", "deg")
    val e = Seq((0L, 1L), (1L, 2L), (2L, 3L)).toDF("src", "dst")
      .withColumn("heavy_attr", lit("y" * 100))
    val g = GraphFrame(v, e)
    val pregel = g.pregel
      .withVertexColumn("acc", lit(0L), coalesce(Pregel.msg, lit(0L)))
      .sendMsgToDst(Pregel.src("deg"))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(1)
    val res = pregel.run()
    val m = res.select("id", "acc").as[(Long, Long)].collect().toMap
    assert(m == Map(0L -> 0L, 1L -> 0L, 2L -> 2L, 3L -> 4L))
    // wide columns preserved in the output even though pruned from structs
    assert(res.columns.contains("wide"))
  }

  test("edge attributes referenced in messages still resolve") {
    val v = (0L until 3L).toDF("id")
    val e = Seq((0L, 1L, 10.0), (1L, 2L, 20.0)).toDF("src", "dst", "w")
    val res = GraphFrame(v, e).pregel
      .withVertexColumn("s", lit(0.0), coalesce(Pregel.msg, lit(0.0)))
      .sendMsgToDst(Pregel.edge("w"))
      .aggMsgs(sum(Pregel.msg))
      .setMaxIter(1)
      .run()
    val m = res.select("id", "s").as[(Long, Double)].collect().toMap
    assert(m == Map(0L -> 0.0, 1L -> 10.0, 2L -> 20.0))
  }

  test("voting + gating still works with pruning") {
    // frontier propagation along a chain with skip-inactive gating
    val g = chain(4)
    val sp = g.shortestPaths.landmarks(Seq(3L)).run()
    val d = sp.select($"id", element_at($"distances", 3L)).as[(Long, Option[Int])]
      .collect().toMap
    assert(d == Map(0L -> Some(3), 1L -> Some(2), 2L -> Some(1), 3L -> Some(0)))
  }

  // --- ported (behaviorally) from reference lib/PregelSuite.scala:28-172 ---

  test("page rank on raw pregel matches the reference's expected ranks") {
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 4L), (2L, 0L), (3L, 4L),
      (4L, 0L), (4L, 2L)).toDF("src", "dst")
    val vertices = GraphFrame.fromEdges(edges).outDegrees
    val n = vertices.count()
    val alpha = 0.15
    val ranks = GraphFrame(vertices, edges).pregel
      .setMaxIter(5)
      .withVertexColumn("rank", lit(1.0 / n),
        coalesce(Pregel.msg, lit(0.0)) * (1.0 - alpha) + alpha / n)
      .sendMsgToDst(Pregel.src("rank") / Pregel.src("outDegree"))
      .aggMsgs(sum(Pregel.msg))
      .run()
    val result = ranks.sort("id").select("rank").as[Double].collect()
    assert(math.abs(result.sum - 1.0) < 1e-6)
    val expected = Seq(0.245, 0.224, 0.303, 0.03, 0.197)
    result.zip(expected).foreach { case (r, e) =>
      assert(math.abs(r - e) < 1e-3, s"rank $r != $e")
    }
  }

  test("chain propagation via sendMsgToSrc (reversed edges)") {
    val n = 5
    val verDF = (1 to n).toDF("id").repartition(3)
    val edgeDF = (1 until n).map(x => (x + 1, x)).toDF("src", "dst").repartition(3)
    val resultDF = GraphFrame(verDF, edgeDF).pregel
      .setMaxIter(n - 1)
      .withVertexColumn("value",
        when($"id" === 1, lit(1)).otherwise(lit(0)),
        when(Pregel.msg > $"value", Pregel.msg).otherwise($"value"))
      .sendMsgToSrc(when(Pregel.dst("value") =!= Pregel.src("value"), Pregel.dst("value")))
      .aggMsgs(max(Pregel.msg))
      .run()
    assert(resultDF.sort("id").select("value").as[Int].collect().toSeq ==
      Seq.fill(n)(1))
  }

  test("chain propagation with early stopping terminates before maxIter") {
    val n = 5
    val verDF = (1 to n).toDF("id").repartition(3)
    val edgeDF = (1 until n).map(x => (x, x + 1)).toDF("src", "dst").repartition(3)
    val resultDF = GraphFrame(verDF, edgeDF).pregel
      .setMaxIter(1000)
      .setEarlyStopping(true)
      .withVertexColumn("value",
        when($"id" === 1, lit(1)).otherwise(lit(0)),
        when(Pregel.msg > $"value", Pregel.msg).otherwise($"value"))
      .sendMsgToDst(when(Pregel.dst("value") =!= Pregel.src("value"), Pregel.src("value")))
      .aggMsgs(max(Pregel.msg))
      .run()
    assert(resultDF.sort("id").select("value").as[Int].collect().toSeq ==
      Seq.fill(n)(1))
  }

  // dst-join-elision adversarial cases from the reference PregelSuite
  // (PregelSuite.scala:497-562): dst references hidden inside a
  // conditional, a map lookup, an array index, and nested struct access
  // must all force the dst-side join — and plain dst.id must not.

  test("dst join required when dst column used in conditional") {
    val v = Seq((0L, true, 10L), (1L, false, 20L), (2L, true, 30L))
      .toDF("id", "flag", "value")
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val result = GraphFrame(v, e).pregel
      .setMaxIter(1)
      .withVertexColumn("received", lit(0L), coalesce(Pregel.msg, col("received")))
      .sendMsgToDst(when(Pregel.dst("flag"), Pregel.src("value")).otherwise(lit(null)))
      .aggMsgs(sum(Pregel.msg))
      .run()
    val received = result.sort("id").select("received").as[Long].collect()
    assert(received.toSeq == Seq(0L, 0L, 20L))
  }

  test("dst join required when dst column used as map key") {
    val v = Seq((0L, "a"), (1L, "b"), (2L, "a")).toDF("id", "key")
    val e = Seq((0L, 1L, Map("a" -> 10L, "b" -> 20L)),
      (1L, 2L, Map("a" -> 30L, "b" -> 40L))).toDF("src", "dst", "weights")
    val result = GraphFrame(v, e).pregel
      .setMaxIter(1)
      .withVertexColumn("received", lit(0L), coalesce(Pregel.msg, col("received")))
      .sendMsgToDst(element_at(Pregel.edge("weights"), Pregel.dst("key")))
      .aggMsgs(sum(Pregel.msg))
      .run()
    val received = result.sort("id").select("received").as[Long].collect()
    assert(received.toSeq == Seq(0L, 20L, 30L))
  }

  test("dst join required when dst column used as array index") {
    val v = Seq((0L, 1), (1L, 2), (2L, 1)).toDF("id", "idx")
    val e = Seq((0L, 1L, Array(100L, 200L)), (1L, 2L, Array(300L, 400L)))
      .toDF("src", "dst", "values")
    val result = GraphFrame(v, e).pregel
      .setMaxIter(1)
      .withVertexColumn("received", lit(0L), coalesce(Pregel.msg, col("received")))
      .sendMsgToDst(element_at(Pregel.edge("values"), Pregel.dst("idx")))
      .aggMsgs(sum(Pregel.msg))
      .run()
    val received = result.sort("id").select("received").as[Long].collect()
    assert(received.toSeq == Seq(0L, 200L, 300L))
  }

  test("dst join required for nested struct field access") {
    val v = Seq((0L, 1.0, 2.0), (1L, 3.0, 4.0), (2L, 5.0, 6.0))
      .toDF("id", "x", "y")
      .selectExpr("id", "named_struct('x', x, 'y', y) as location")
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val result = GraphFrame(v, e).pregel
      .setMaxIter(1)
      .withVertexColumn("received", lit(0.0), coalesce(Pregel.msg, col("received")))
      .sendMsgToDst(col("dst.location.x") + col("src.location.y"))
      .aggMsgs(sum(Pregel.msg))
      .run()
    val received = result.sort("id").select("received").as[Double].collect()
    assert(received.toSeq == Seq(0.0, 3.0 + 2.0, 5.0 + 4.0))
  }

  test("message referencing only dst.id still computes correctly (join elided)") {
    val v = (0L until 3L).toDF("id")
    val e = Seq((0L, 1L), (1L, 2L)).toDF("src", "dst")
    val result = GraphFrame(v, e).pregel
      .setMaxIter(1)
      .withVertexColumn("received", lit(0L), coalesce(Pregel.msg, col("received")))
      .sendMsgToDst(Pregel.dst("id") * 10L)
      .aggMsgs(sum(Pregel.msg))
      .run()
    val received = result.sort("id").select("received").as[Long].collect()
    assert(received.toSeq == Seq(0L, 10L, 20L))
  }

  test("new vertex column init may read a nullable column") {
    val verDF = Seq(1L, 2L, 3L, 4L).toDF("id")
      .withColumn("nullableColumn",
        when($"id" % 2 === 0, lit(null)).otherwise(lit(1)))
    val edgeDF = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)).toDF("src", "dst")
    val resultDF = GraphFrame(verDF, edgeDF).pregel
      .withVertexColumn("newColumn",
        when($"nullableColumn".isNull, lit(0)).otherwise(lit(1)),
        $"newColumn" + Pregel.msg)
      .sendMsgToDst(lit(1))
      .aggMsgs(last(Pregel.msg))
      .setCheckpointInterval(0)
      .setMaxIter(1)
      .run()
    val m = resultDF.select("id", "newColumn").as[(Long, Int)].collect().toMap
    assert(m == Map(1L -> 2, 2L -> 1, 3L -> 2, 4L -> 1))
  }

  test("requiredSrcColumns: manual pruning hint gives the reference's ranks") {
    // reference PregelSuite.scala:174-209
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 4L), (2L, 0L), (3L, 4L), (4L, 0L), (4L, 2L))
      .toDF("src", "dst")
    val vertices = GraphFrame.fromEdges(edges).outDegrees
    val n = vertices.count()
    val alpha = 0.15
    val ranks = GraphFrame(vertices, edges).pregel
      .setMaxIter(5)
      .withVertexColumn("rank", lit(1.0 / n),
        coalesce(Pregel.msg, lit(0.0)) * (1.0 - alpha) + alpha / n)
      .sendMsgToDst(Pregel.src("rank") / Pregel.src("outDegree"))
      .aggMsgs(sum(Pregel.msg))
      .requiredSrcColumns("rank", "outDegree")
      .run()
    val result = ranks.sort("id").select("rank").as[Double].collect()
    assert(math.abs(result.sum - 1.0) < 1e-6)
    val expected = Seq(0.245, 0.224, 0.303, 0.03, 0.197)
    result.zip(expected).foreach { case (r, e) => assert(math.abs(r - e) < 1e-3) }
    // an omitted-but-referenced field fails loudly (not silently wrong)
    intercept[Exception] {
      GraphFrame(vertices, edges).pregel
        .setMaxIter(1)
        .withVertexColumn("rank", lit(1.0), coalesce(Pregel.msg, lit(0.0)))
        .sendMsgToDst(Pregel.src("rank") / Pregel.src("outDegree"))
        .aggMsgs(sum(Pregel.msg))
        .requiredSrcColumns("rank") // outDegree referenced but omitted
        .run().collect()
    }
  }

  test("requiredDstColumns: reverse chain propagation, dst join forced on") {
    // reference PregelSuite.scala:211-237
    val n = 5
    val verDF = (1 to n).toDF("id").repartition(3)
    val edgeDF = (1 until n).map(x => (x + 1, x)).toDF("src", "dst").repartition(3)
    val resultDF = GraphFrame(verDF, edgeDF).pregel
      .setMaxIter(n - 1)
      .withVertexColumn("value",
        when($"id" === lit(1), lit(1)).otherwise(lit(0)),
        when(Pregel.msg > $"value", Pregel.msg).otherwise($"value"))
      .sendMsgToSrc(when(Pregel.dst("value") =!= Pregel.src("value"), Pregel.dst("value")))
      .aggMsgs(max(Pregel.msg))
      .requiredDstColumns("value")
      .run()
    assert(resultDF.sort("id").select("value").as[Int].collect().toSeq ==
      Seq.fill(n)(1))
  }

  test("requiredSrcColumns and requiredDstColumns together") {
    // reference PregelSuite.scala:238-265
    val n = 5
    val verDF = (1 to n).toDF("id").repartition(3)
    val edgeDF = (1 until n).map(x => (x, x + 1)).toDF("src", "dst").repartition(3)
    val resultDF = GraphFrame(verDF, edgeDF).pregel
      .setMaxIter(n - 1)
      .withVertexColumn("value",
        when($"id" === lit(1), lit(1)).otherwise(lit(0)),
        when(Pregel.msg > $"value", Pregel.msg).otherwise($"value"))
      .sendMsgToDst(when(Pregel.dst("value") =!= Pregel.src("value"), Pregel.src("value")))
      .aggMsgs(max(Pregel.msg))
      .requiredSrcColumns("value")
      .requiredDstColumns("value")
      .run()
    assert(resultDF.sort("id").select("value").as[Int].collect().toSeq ==
      Seq.fill(n)(1))
  }

  test("state column inside a HOF lambda body resolves to the NEW state (lateral alias)") {
    // The update projection aliases the new state under the old name, and
    // Spark resolves a lambda-captured column reference against that
    // lateral alias — NOT the join child. A voting expression comparing
    // old-to-new must therefore pass the old state as a HOF ARGUMENT
    // (weighted ShortestPaths does; this pins the underlying behavior so
    // a Spark-side change is noticed).
    import org.apache.spark.sql.functions._
    val v = Seq(1, 2).toDF("id")
    val e = Seq((1, 2)).toDF("src", "dst")
    // state: array<int> growing by one element per round
    val captured = GraphFrame(v, e).pregel
      .withVertexColumn("xs", array(lit(0)),
        array_union(col("xs"), coalesce(Pregel.msg, array())))
      // dbg: does a lambda referencing col("xs") see the OLD or NEW array?
      // new xs = [0, 1] (size 2), old xs = [0] (size 1); the predicate
      // x === size(col("xs")) matches an element of [0, 1] only when the
      // lambda's col("xs") resolved to the OLD size-1 array
      .withVertexColumn("lambda_saw_old", lit(false),
        exists(array_union(col("xs"), coalesce(Pregel.msg, array())),
          x => x === size(col("xs"))))
      .sendMsgToDst(array(Pregel.src("xs")(0) + 1))
      .aggMsgs(flatten(collect_list(Pregel.msg)))
      .setMaxIter(1)
      .run()
    val row = captured.filter(col("id") === 2)
      .select("xs", "lambda_saw_old").head()
    assert(row.getSeq[Int](0) === Seq(0, 1)) // new state after one round
    assert(!row.getBoolean(1),
      "lambda-captured state column resolved to the OLD state — Spark's " +
        "lateral-alias behavior changed; the weighted-ShortestPaths " +
        "voting expression contract can be simplified")
  }
}
