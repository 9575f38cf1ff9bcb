package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming funnel: cross-batch state carry, once-only conversion,
 * window anchoring, tie ordering, and the in-order contract. */
class StreamingFunnelSpec extends TestBase {
  import spark.implicits._

  private val MIN = 60000L
  private val T0 = 1700000000000L

  private def run(batches: Seq[Seq[(Long, String, Long)]], win: Int = 60)
      : Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "event_type", "ms")
      .withColumn("ts_utc", timestamp_millis(col("ms")))
    val out = EventStreams.funnelStream(ev, Seq("view", "click", "purchase"), win)
    val sink = s"funnel_sink_${System.nanoTime()}"
    val q = out.toDF().writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(sink).as[(Long, Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  test("conversion spans micro-batches; emitted exactly once with batch-equal times") {
    val rows = run(Seq(
      Seq((1L, "view", T0)),
      Seq((1L, "click", T0 + 5 * MIN)),
      Seq((1L, "purchase", T0 + 9 * MIN),
        (1L, "purchase", T0 + 20 * MIN)))) // second purchase: no re-emit
    assert(rows == Seq((1L, T0, T0 + 9 * MIN, 9 * MIN)))
  }

  test("window anchors at the FIRST view; steps beyond it never convert") {
    val rows = run(Seq(Seq(
      (1L, "view", T0), (1L, "view", T0 + 30 * MIN), // later view can't re-anchor
      (1L, "click", T0 + 50 * MIN),
      (1L, "purchase", T0 + 70 * MIN)))) // 70 > 60 from the FIRST view
    assert(rows.isEmpty)
    val ok = run(Seq(Seq(
      (2L, "view", T0), (2L, "click", T0 + 50 * MIN),
      (2L, "purchase", T0 + 60 * MIN)))) // exactly on the bound: in
    assert(ok == Seq((2L, T0, T0 + 60 * MIN, 60 * MIN)))
  }

  test("equal timestamps: lower step matches first (view+click+purchase same ms)") {
    val rows = run(Seq(Seq(
      (1L, "purchase", T0), (1L, "click", T0), (1L, "view", T0))))
    assert(rows == Seq((1L, T0, T0, 0L)))
  }

  test("out-of-order ACROSS batches drops (documented contract); users isolated") {
    val rows = run(Seq(
      Seq((1L, "click", T0 + 5 * MIN)), // arrives before its view: ignored at k=0
      Seq((1L, "view", T0)),            // anchor set now
      Seq((1L, "purchase", T0 + 9 * MIN)), // still k=1: no click matched
      Seq((2L, "view", T0), (2L, "click", T0 + MIN), (2L, "purchase", T0 + 2 * MIN))))
    assert(rows == Seq((2L, T0, T0 + 2 * MIN, 2 * MIN)))
  }

  test("matches the batch operator's converted set on an in-order stream") {
    val evs = (1L to 200L).map { i =>
      (i % 9, Seq("view", "click", "purchase", "error")((i % 11 % 4).toInt),
        T0 + i * 3 * MIN)
    }
    val streamed = run(evs.sortBy(_._3).grouped(40).toSeq, win = 240)
      .map(r => (r._1, r._2, r._3)).toSet
    // batch twin over the identical rows
    val batchIn = evs.toDF("user_id", "event_type", "ms")
      .select(col("user_id"), col("event_type"),
        timestamp_millis(col("ms")).as("ts"))
    import org.apache.spark.sql.Row
    val s1 = graft.pipeline.Events
      .funnel(batchIn, Seq("view", "click", "purchase"), 240)
      .collect().map { case Row(step: Int, _, n: Long, _) => (step, n) }.toMap
    assert(streamed.size == s1(3), s"streamed ${streamed.size} vs batch ${s1(3)}")
  }
}
