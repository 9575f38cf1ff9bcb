package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming windowed heavy hitters: incremental counts across
 * micro-batches, then the deterministic batch top-k finisher. */
class StreamingTopKSpec extends TestBase {
  import spark.implicits._

  private val T0 = 1700000000000L // fixed epoch ms, hour-aligned enough
  private val HOUR = 3600000L

  private def run(batches: Seq[Seq[(Long, String, Long)]], k: Int)
      : Seq[(String, String, Long, Long, Long)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "event_type", "ms")
      .withColumn("ts_utc", timestamp_millis(col("ms")))
    val out = EventStreams.userCountsStream(ev, complete = true)
    val sink = s"topk_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      EventStreams.topK(spark.table(sink), k)
        .select(col("window_start"), col("event_type"), col("user_id"),
          col("n_events"), col("rank").cast("long"))
        .as[(String, String, Long, Long, Long)].collect().toSeq
    } finally q.stop()
  }

  test("counts accumulate across micro-batches; top-k cut with user_id tie-break") {
    val t = T0 - (T0 % HOUR) // hour-aligned base
    val rows = run(Seq(
      Seq((1L, "click", t), (1L, "click", t + 1), (2L, "click", t + 2)),
      Seq((2L, "click", t + 3), (3L, "click", t + 4), (1L, "click", t + 5))),
      k = 2)
    // user 1: 3 events, user 2: 2, user 3: 1 → top-2 is users 1, 2
    val byUser = rows.map(r => (r._3, (r._4, r._5))).toMap
    assert(byUser == Map(1L -> (3L, 1L), 2L -> (2L, 2L)))
  }

  test("ties rank by user_id ascending; ranks are per (window, type)") {
    val t = T0 - (T0 % HOUR)
    val rows = run(Seq(Seq(
      (5L, "view", t), (9L, "view", t + 1), (7L, "view", t + 2), // all count 1
      (5L, "buy", t + HOUR), (5L, "buy", t + HOUR + 1))), k = 2)
    val views = rows.filter(_._2 == "view").sortBy(_._5)
    assert(views.map(_._3) == Seq(5L, 7L)) // tie → smaller user_id first, 9 cut
    val buys = rows.filter(_._2 == "buy")
    assert(buys.map(r => (r._3, r._4, r._5)) == Seq((5L, 2L, 1L))) // own window
  }

  test("events in different hours never share a window") {
    val t = T0 - (T0 % HOUR)
    val rows = run(Seq(Seq((1L, "click", t), (1L, "click", t + HOUR))), k = 1)
    assert(rows.size == 2 && rows.forall(_._4 == 1L))
    assert(rows.map(_._1).distinct.size == 2)
  }
}
