package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Stream-stream interval join: cross-micro-batch buffering, the
 * [0, window] boundary rule, and per-user isolation. */
class StreamingIntervalJoinSpec extends TestBase {
  import spark.implicits._

  private val T0 = 1700000000000L // arbitrary fixed epoch ms

  private def runBatches(batches: Seq[Seq[(Long, Long, String, Long)]])
      : Seq[(Long, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Long, String, Long)]
    val ev = in.toDF().toDF("event_id", "user_id", "event_type", "ms")
      .withColumn("ts_utc", timestamp_millis(col("ms")))
    val out = EventStreams.intervalJoinStream(ev, "click", "purchase",
      windowMinutes = 30)
    val sink = s"interval_join_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(sink).as[(Long, Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  test("pairs within the window join; boundary inclusive; later/earlier drop") {
    val min = 60000L
    val rows = runBatches(Seq(Seq(
      (1L, 7L, "click", T0),
      (2L, 7L, "purchase", T0 + 10 * min), // in window
      (3L, 7L, "purchase", T0 + 30 * min), // exactly on the boundary: in
      (4L, 7L, "purchase", T0 + 31 * min), // beyond: out
      (5L, 7L, "purchase", T0 - min), // before the click: out
      (6L, 9L, "purchase", T0 + min)))) // other user: out
    assert(rows.map(r => (r._1, r._2)).toSet == Set((1L, 2L), (1L, 3L)))
    assert(rows.find(_._2 == 3L).get._4 == 30 * min) // lag_ms
  }

  test("stream-static enrichment joins every batch against the dimension") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val ev = in.toDF().toDF("user_id", "value")
    val dim = Seq((7L, "DE"), (9L, "FR")).toDF("k", "country")
    val out = EventStreams.enrichStream(ev, dim, "user_id", "k")
      .groupBy("country").agg(sum("value").as("total"))
    val sink = s"enrich_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      in.addData(Seq((7L, 1.0), (9L, 2.0), (8L, 99.0))) // 8 has no dim row
      q.processAllAvailable()
      in.addData(Seq((7L, 3.0)))
      q.processAllAvailable()
      val m = spark.table(sink).as[(String, Double)].collect().toMap
      assert(m == Map("DE" -> 4.0, "FR" -> 2.0))
    } finally q.stop()
  }

  test("a later micro-batch's purchase joins a buffered earlier click") {
    val min = 60000L
    val rows = runBatches(Seq(
      Seq((1L, 7L, "click", T0)),
      Seq((2L, 7L, "purchase", T0 + 5 * min),
        (3L, 7L, "click", T0 + 6 * min)),
      Seq((4L, 7L, "purchase", T0 + 7 * min))))
    // purchase 2 joins the batch-1 click; purchase 4 joins BOTH clicks
    assert(rows.map(r => (r._1, r._2)).toSet ==
      Set((1L, 2L), (1L, 4L), (3L, 4L)))
  }
}
