package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming keep-latest-per-key upsert view: a later micro-batch must
 * overwrite a key's state, out-of-order rows must NOT, and same-ts rows
 * break ties by event_id. */
class StreamingLatestSpec extends TestBase {
  import spark.implicits._

  private val T0 = 1700000000000L

  private def run(batches: Seq[Seq[(Long, Long, String, Double, Long)]])
      : Map[Long, (Long, Long, String, Double)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    // (event_id, user_id, event_type, value, ms)
    val in = MemoryStream[(Long, Long, String, Double, Long)]
    val ev = in.toDF().toDF("event_id", "user_id", "event_type", "value", "ms")
      .withColumn("ts", timestamp_millis(col("ms")))
    val out = EventStreams.latestPerKeyStream(ev)
    val sink = s"latest_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      batches.foreach { b => in.addData(b); q.processAllAvailable() }
      spark.table(sink)
        .select(col("user_id"), col("last_ms"), col("last_event_id"),
          col("last_event_type"), col("last_value"))
        .as[(Long, Long, Long, String, Double)].collect()
        .map(r => r._1 -> (r._2, r._3, r._4, r._5)).toMap
    } finally q.stop()
  }

  test("later batches overwrite, out-of-order rows don't, ties break by event_id") {
    val got = run(Seq(
      Seq((10L, 1L, "view", 1.0, T0), (20L, 2L, "view", 2.0, T0)),
      Seq((11L, 1L, "click", 3.0, T0 + 5000), // newer: overwrites user 1
        (21L, 2L, "click", 4.0, T0 - 5000), // older: user 2 keeps view
        (31L, 3L, "buy", 5.0, T0), (30L, 3L, "view", 6.0, T0)))) // same ts:
    // event_id 31 wins for user 3
    assert(got(1L) == (T0 + 5000, 11L, "click", 3.0))
    assert(got(2L) == (T0, 20L, "view", 2.0))
    assert(got(3L) == (T0, 31L, "buy", 5.0))
  }
}
