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
