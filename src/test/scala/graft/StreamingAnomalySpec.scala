package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.EventStreams

/** Streaming rate-spike detection: incremental windowed counts across
 * micro-batches, then the exact-integer lag finisher — flags replay the
 * n·lookback·den > num·Σprev cross-multiplication with no floats. */
class StreamingAnomalySpec extends TestBase {
  import spark.implicits._

  private val T0 = 1700000000000L
  private val HOUR = 3600000L

  /** (event_type, count) per consecutive hour index, streamed in the given
   * micro-batch splits, returns (window_start, type, n, prev_sum, spike). */
  private def run(batches: Seq[Seq[(String, Int, Int)]], lookback: Int = 3,
      num: Long = 3L, den: Long = 2L)
      : Seq[(String, String, Long, Option[Long], Boolean)] = {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val t = T0 - (T0 % HOUR)
    val in = MemoryStream[(String, Long, Double)]
    val ev = in.toDF().toDF("event_type", "ms", "value")
      .withColumn("ts_utc", timestamp_millis(col("ms")))
    val out = EventStreams.hourlyAggStream(ev, complete = true)
    val sink = s"anomaly_sink_${System.nanoTime()}"
    val q = out.writeStream.format("memory").queryName(sink)
      .outputMode("complete").start()
    try {
      batches.foreach { b =>
        in.addData(b.flatMap { case (tp, hourIdx, n) =>
          (1 to n).map(j => (tp, t + hourIdx * HOUR + j, 0.5)) })
        q.processAllAvailable()
      }
      EventStreams.rateSpikes(spark.table(sink), lookback, num, den)
        .select(col("window_start"), col("event_type"), col("n_events"),
          col("prev_sum"), col("spike"))
        .collect().toSeq.map(r => (r.getString(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
    } finally q.stop()
  }

  test("spike fires only past 1.5x the trailing-3 mean; cold start is false") {
    // clicks per hour: 4, 4, 4, 7 (spike: 7·6=42 > 3·12=36), then 6 (no:
    // 6·6=36 > 3·15=45 false) — first three hours lack history → false
    val rows = run(Seq(Seq(("click", 0, 4), ("click", 1, 4), ("click", 2, 4),
      ("click", 3, 7), ("click", 4, 6))))
    val byHour = rows.sortBy(_._1).map(r => (r._3, r._4, r._5))
    assert(byHour == Seq((4L, None, false), (4L, None, false), (4L, None, false),
      (7L, Some(12L), true), (6L, Some(15L), false)))
  }

  test("boundary is strict: exactly 1.5x the mean is NOT a spike") {
    // 2, 2, 2 then 3: 3·6 = 18 = 3·6 — strict > fails, no spike
    val rows = run(Seq(Seq(("buy", 0, 2), ("buy", 1, 2), ("buy", 2, 2),
      ("buy", 3, 3))))
    assert(rows.sortBy(_._1).last == ((rows.map(_._1).max, "buy", 3L, Some(6L), false)))
  }

  test("types are independent; counts accumulate across micro-batches") {
    // click hour 3 reaches 7 only after the second micro-batch; view's
    // history is its own (1,1,1 then 1 → no spike)
    val rows = run(Seq(
      Seq(("click", 0, 4), ("click", 1, 4), ("click", 2, 4), ("click", 3, 3),
        ("view", 0, 1), ("view", 1, 1), ("view", 2, 1), ("view", 3, 1)),
      Seq(("click", 3, 4))))
    val clicks = rows.filter(_._2 == "click").sortBy(_._1)
    assert(clicks.last._3 == 7L && clicks.last._5)
    assert(rows.filter(_._2 == "view").forall(!_._5))
  }

  test("silent hours are skipped, not zero-filled: lag sees previous observed windows") {
    // hours 0, 1, 2 then a gap to hour 9 with count 7: prev_sum is still
    // 12 (the three OBSERVED windows) → spike
    val rows = run(Seq(Seq(("click", 0, 4), ("click", 1, 4), ("click", 2, 4),
      ("click", 9, 7))))
    val last = rows.sortBy(_._1).last
    assert(last._3 == 7L && last._4 == Some(12L) && last._5)
  }

  test("guards reject nonsense parameters") {
    val df = Seq(("2024-01-01 00", "click", 1L)).toDF("window_start", "event_type", "n_events")
    intercept[IllegalArgumentException] { EventStreams.rateSpikes(df, lookback = 0) }
    intercept[IllegalArgumentException] { EventStreams.rateSpikes(df, num = 0L) }
  }
}
