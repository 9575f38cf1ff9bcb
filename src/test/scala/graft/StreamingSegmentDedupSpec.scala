package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming segment dedup: first-arrival-keeps semantics, state carried
 * across micro-batches, and agreement with the batch operator when no
 * segment exceeds the cap. */
class StreamingSegmentDedupSpec extends TestBase {
  import spark.implicits._

  private def runBatches(batches: Seq[Seq[(Long, String)]],
      maxDupCount: Long): Seq[(Long, Int, String, Boolean)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String)]
    val docs = in.toDF().toDF("doc_id", "text")
    val out = EventStreams.segmentDedupStream(docs, "doc_id", "text",
      windowWords = 2, maxDupCount = maxDupCount)
    val sink = s"seg_dedup_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(sink).as[(Long, Int, String, Boolean)].collect().toSeq
    } finally q.stop()
  }

  test("first maxDupCount occurrences pass; later ones drop, across batches") {
    val rows = runBatches(Seq(
      Seq((1L, "accept cookies body one"), (2L, "accept cookies body two")),
      Seq((3L, "accept cookies body three"))), maxDupCount = 1)
    val byDoc = rows.groupBy(_._1)
    // "accept cookies" window: kept only for the first arrival (doc 1)
    val acceptRows = rows.filter(_._3 == "accept cookies")
    assert(acceptRows.size === 3)
    assert(acceptRows.count(_._4) === 1)
    assert(acceptRows.find(_._4).get._1 === 1L)
    // doc 3 arrived in a LATER batch — state remembered the count
    assert(byDoc(3L).find(_._3 == "accept cookies").get._4 === false)
    // unique windows all kept
    assert(rows.filter(_._3.startsWith("body")).forall(_._4))
  }

  test("maxDupCount > 1 admits that many occurrences") {
    val rows = runBatches(Seq(
      Seq((1L, "dup seg aa bb")), Seq((2L, "dup seg cc dd")),
      Seq((3L, "dup seg ee ff"))), maxDupCount = 2)
    val dup = rows.filter(_._3 == "dup seg").sortBy(_._1)
    assert(dup.map(_._4) === Seq(true, true, false))
  }

  test("agrees with batch segmentDedup when nothing exceeds the cap") {
    val docs = Seq((1L, "aa bb cc dd"), (2L, "ee ff gg hh"))
    val streamed = runBatches(Seq(docs), maxDupCount = 1)
    assert(streamed.forall(_._4))
    val batch = pipeline.Dedup.segmentDedup(docs.toDF("doc_id", "text"),
        "doc_id", "text", windowWords = 2, maxDupCount = 1)
      .select("doc_id", "kept", "dropped")
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(batch === Map(1L -> ((2L, 0L)), 2L -> ((2L, 0L))))
  }
}
