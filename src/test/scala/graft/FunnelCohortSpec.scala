package graft

import org.apache.spark.sql.functions._
import graft.pipeline.Events

/** Ordered-funnel and cohort-retention semantics on hand-built event
 * streams (epoch-ms timestamps via timestamp_millis). */
class FunnelCohortSpec extends TestBase {
  import spark.implicits._

  private val MIN = 60000L
  private val T0 = 1700000000000L

  private def ev(rows: Seq[(Long, String, Long)]) =
    rows.toDF("user_id", "event_type", "ms")
      .select(col("user_id"), col("event_type"),
        timestamp_millis(col("ms")).as("ts"))

  private def funnelMap(rows: Seq[(Long, String, Long)], win: Int = 60) =
    Events.funnel(ev(rows), Seq("view", "click", "purchase"), win)
      .collect().map(r => (r.getInt(0), (r.getString(1), r.getLong(2)))).toMap

  test("steps must match in order; out-of-order clicks don't count") {
    val m = funnelMap(Seq(
      (1L, "view", T0), (1L, "click", T0 + MIN), (1L, "purchase", T0 + 2 * MIN),
      (2L, "click", T0), (2L, "view", T0 + MIN), // click BEFORE view: no step 2
      (3L, "view", T0))) // stops at step 1
    assert(m(1) == ("view", 3L))
    assert(m(2) == ("click", 1L))
    assert(m(3) == ("purchase", 1L))
  }

  test("window bound is inclusive and anchored at the FIRST view") {
    val m = funnelMap(Seq(
      (1L, "view", T0), (1L, "click", T0 + 60 * MIN), // exactly on bound: in
      (2L, "view", T0), (2L, "click", T0 + 61 * MIN), // beyond: out
      // user 3: a later view cannot re-anchor the window
      (3L, "view", T0), (3L, "view", T0 + 30 * MIN), (3L, "click", T0 + 80 * MIN)),
      win = 60)
    // only user 1 converts: boundary inclusive, anchor is the first view
    assert(m(1) == ("view", 3L) && m(2) == ("click", 1L), m.toString)
  }

  test("step k anchors at step k-1's matched time, not any later event") {
    // click at T0+5 matches; purchase BEFORE the click (T0+2) must not count
    val m = funnelMap(Seq(
      (1L, "view", T0), (1L, "click", T0 + 5 * MIN), (1L, "purchase", T0 + 2 * MIN)))
    assert(m(3) == ("purchase", 0L))
    // conversion of an empty step is 0 over n1
    val c = Events.funnel(ev(Seq((1L, "view", T0))), Seq("view", "click"), 60)
      .collect().map(r => (r.getInt(0), r.getDouble(3))).toMap
    assert(c(1) == 1.0 && c(2) == 0.0)
  }

  test("cohort retention: offsets count distinct users per week") {
    val W = 604800000L
    val base = (T0 / W) * W // week-aligned
    val rows = Seq(
      (1L, "view", base), (1L, "view", base + W), (1L, "view", base + 2 * W),
      (2L, "view", base), (2L, "view", base + 2 * W),
      (3L, "view", base + W)) // later cohort
    val m = Events.cohortRetention(ev(rows))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    val c0 = base / W
    assert(m((c0, 0L)) == 2L && m((c0, 1L)) == 1L && m((c0, 2L)) == 2L)
    assert(m((c0 + 1, 0L)) == 1L && m.size == 4)
  }

  test("linearAttribution: equal split per conversion, window-inclusive, multi-conversion sums") {
    val rows = Seq(
      // user 1: views at t0, t0+10m; purchases at t0+20m (sees both ->
      // 1/2 each) and t0+70m (only the t0+10m view in a 60m window -> 1)
      (10L, 1L, "view", T0), (11L, 1L, "view", T0 + 10 * MIN),
      (12L, 1L, "purchase", T0 + 20 * MIN), (13L, 1L, "purchase", T0 + 70 * MIN),
      // user 2: view exactly ON the window boundary (inclusive)
      (20L, 2L, "view", T0), (21L, 2L, "purchase", T0 + 60 * MIN),
      // user 3: view AFTER the purchase — no credit
      (30L, 3L, "purchase", T0), (31L, 3L, "view", T0 + MIN))
      .toDF("event_id", "user_id", "event_type", "ms")
      .select(col("event_id"), col("user_id"), col("event_type"),
        timestamp_millis(col("ms")).as("ts"))
    val got = Events.linearAttribution(rows, "view", "purchase", windowMinutes = 60)
      .collect().map(r => r.getLong(0) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got(10L) == ((1L, 0.5)))
    assert(got(11L) == ((2L, 1.5))) // 0.5 + 1.0 from the second purchase
    assert(got(20L) == ((1L, 1.0))) // boundary inclusive
    assert(!got.contains(31L))
  }

  test("rfm: exact integer metrics, bucket 1 is best, user_id tie-break") {
    val DAY = 86400000L
    val rows = Seq(
      // user 1: 3 events, latest day 2, spend 10.50+0.25+1.00
      (1L, "a", 2 * DAY, 1.00), (1L, "b", 2 * DAY + MIN, 10.50), (1L, "c", MIN, 0.25),
      // user 2: 1 event day 0, spend 99.99
      (2L, "a", 5L, 99.99),
      // user 3: 2 events day 1, spend 0
      (3L, "a", DAY, 0.0), (3L, "b", DAY + MIN, 0.0))
      .toDF("user_id", "event_type", "ms", "value")
      .withColumn("event_id", col("user_id") * 10)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"),
        timestamp_millis(col("ms")).as("ts"))
    val got = Events.rfm(rows, buckets = 3).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getInt(4), r.getInt(5), r.getInt(6)))).toMap
    // metrics: exact cents, epoch days
    assert(got(1L) == ((2L, 3L, 1175L, 1, 1, 2)))
    assert(got(2L) == ((0L, 1L, 9999L, 3, 3, 1)))
    assert(got(3L) == ((1L, 2L, 0L, 2, 2, 3)))
  }

  test("sessionPaths: gap splits sessions, maxSteps truncates, ties break on event_id") {
    val rows = Seq(
      // user 1, session 0: six events — path truncated to the first 5
      (1L, "a", T0, 10L), (1L, "b", T0 + MIN, 11L), (1L, "c", T0 + 2 * MIN, 12L),
      (1L, "d", T0 + 3 * MIN, 13L), (1L, "e", T0 + 4 * MIN, 14L),
      (1L, "f", T0 + 5 * MIN, 15L),
      // user 1, session 1 after a 31-min gap
      (1L, "z", T0 + 36 * MIN, 16L),
      // user 2: two same-timestamp events ordered by event_id
      (2L, "y", T0, 21L), (2L, "x", T0, 20L))
      .toDF("user_id", "event_type", "ms", "event_id")
      .select(col("user_id"), col("event_type"), col("event_id"),
        timestamp_millis(col("ms")).as("ts"))
    val got = Events.sessionPaths(rows, gapMinutes = 30, maxSteps = 5)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        (r.getString(2), r.getLong(3)))).toMap
    assert(got((1L, 0L)) == ("a>b>c>d>e", 5L)) // f truncated
    assert(got((1L, 1L)) == ("z", 1L))
    assert(got((2L, 0L)) == ("x>y", 2L)) // event_id 20 before 21
    val top = Events.topPaths(rows, 30, 5, k = 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    // counts all 1 -> path-asc decides: a>b>c>d>e, then x>y
    assert(top.toSeq == Seq(("a>b>c>d>e", 1L), ("x>y", 1L)))
  }
}
