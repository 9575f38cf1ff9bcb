package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Event-stream style operators over a timestamped events table: tumbling
 * window aggregation and gap-based sessionization. Batch forms here;
 * streaming forms (watermarked) in [[graft.streaming.EventStreams]].
 */
object Events {

  /** Epoch milliseconds of the `ts` column. Parquet TIMESTAMP(NANOS) is
   * read as a Long (nanos) under `spark.sql.legacy.parquet.nanosAsLong`;
   * integer `div` avoids the double-precision loss a plain `/` would hit
   * on ~1e18 nano values. Micros without `isAdjustedToUTC` surface as
   * TIMESTAMP_NTZ, which `unix_millis` rejects — cast through TIMESTAMP
   * (sessions here run UTC, so the reinterpretation is identity). */
  private def tsMillis(events: DataFrame): org.apache.spark.sql.Column =
    events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col("ts").cast("timestamp"))
      case _ => unix_millis(col("ts"))
    }

  /** Tumbling hourly aggregation: (event_type, window_start: string,
   * n_events, sum_value). The window key is formatted as a string so any
   * oracle engine compares it without timestamp-precision skew. */
  def hourlyAgg(events: DataFrame): DataFrame =
    events.groupBy(
        col("event_type"),
        date_format(date_trunc("hour", timestamp_millis(tsMillis(events))),
          "yyyy-MM-dd HH").as("window_start"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))

  /** Gap-based sessionization: a new session starts when a user is idle
   * longer than `gapMinutes`. Returns one row per session:
   * (user_id, session_idx, n_events, duration_ms). */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ms = tsMillis(events)
    val newSession = when(
      ms - lag(ms, 1).over(byUser) > gapMinutes * 60L * 1000L, 1).otherwise(0)
    events
      .withColumn("_sess", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("_ms", ms)
      .groupBy(col("user_id"), col("_sess").as("session_idx"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("_ms")) - min(col("_ms"))).as("duration_ms"))
  }
}
