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
}
