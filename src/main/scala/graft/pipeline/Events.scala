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
  private[graft] def tsMillis(events: DataFrame): org.apache.spark.sql.Column =
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

  /**
   * As-of join: attach to every left row the LATEST right row with
   * `rightTs <= leftTs` (strictly `<` when `strict`) sharing the `on`
   * keys — event attribution, slowly-changing-dimension lookup, "price
   * as of trade time". `direction = "forward"` flips the rule to the
   * EARLIEST right row with `rightTs >= leftTs` (strictly `>` when
   * `strict`) — "next purchase after this view" — by running the same
   * single-pass scan in descending time order.
   *
   * Spark-first plan: ONE union + window pass. Both sides are tagged and
   * unioned, sorted within each key partition by (ts, side, payload),
   * and a running `last(payload, ignoreNulls)` carries the most recent
   * right payload forward into each left row. That is a single
   * shuffle-and-sort at scan width — no per-row range probe, and none of
   * the O(|L|·|R| per key) blowup of the naive `join + filter + rank`
   * formulation. Skewed keys follow the sort's range partitioning.
   *
   * Determinism: among right rows tied on (key, ts), the LARGEST payload
   * struct wins (lexicographic by `rightCols` order) — pass a unique id
   * as `rightCols.head` for a total tie-break. Output: every left column
   * plus each of `rightCols` as `prefix + name` (null when no right row
   * qualifies).
   */
  def asofJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightTs: String, rightCols: Seq[String],
      prefix: String = "asof_", strict: Boolean = false,
      direction: String = "backward"): DataFrame = {
    require(on.nonEmpty, "asofJoin: join keys required")
    require(rightCols.nonEmpty, "asofJoin: rightCols required")
    require(direction == "backward" || direction == "forward",
      s"asofJoin: direction must be 'backward' or 'forward', got '$direction'")
    // the internal tag columns would silently shadow (or ambiguate) any
    // caller column with the same name — fail loudly instead, mirroring
    // MotifCompiler's __tmp guard
    val reserved = Seq("_asof_ts", "_asof_side", "_asof_pay", "_asof_hit")
    for (df <- Seq(left, right); c <- df.columns if reserved.contains(c))
      throw new IllegalArgumentException(
        s"asofJoin: input column '$c' collides with a reserved internal name " +
          s"(${reserved.mkString(", ")})")
    val pay = struct(rightCols.map(col): _*)
    val rSide = right.select((on.map(col) :+ col(rightTs).as("_asof_ts") :+
      lit(0).as("_asof_side") :+ pay.as("_asof_pay")): _*)
    val payType = rSide.schema("_asof_pay").dataType
    val lCols = left.columns.toSeq
    val lSide = left.select((lCols.map(col) :+ col(leftTs).as("_asof_ts") :+
      lit(1).as("_asof_side") :+ lit(null).cast(payType).as("_asof_pay")): _*)
    // left-only columns are null on right rows; dropped again at the end
    val unioned = lSide.unionByName(rSide, allowMissingColumns = true)
    // side order decides ties at equal ts: right-before-left gives <=
    // (backward) / >= (forward), left-before-right gives the strict rule.
    // forward mode is the identical scan in DESCENDING time: the running
    // last() then carries the nearest LATER right payload into each left
    // row; tied right payloads stay ascending in scan order, so the
    // largest-payload tie-break is the same in both directions.
    val sideOrd = if (strict) col("_asof_side").desc else col("_asof_side").asc
    val tsOrd =
      if (direction == "forward") col("_asof_ts").desc else col("_asof_ts").asc
    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(tsOrd, sideOrd, col("_asof_pay").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_asof_hit", last(col("_asof_pay"), ignoreNulls = true).over(w))
      .filter(col("_asof_side") === 1)
      .select((lCols.map(col) ++
        rightCols.map(c => col("_asof_hit")(c).as(prefix + c))): _*)
  }

  /** Ordered conversion funnel: per user, step k matches at the EARLIEST
   * event of type `steps(k)` at-or-after the step k−1 match, all within
   * `windowMinutes` of the step-1 match (millisecond-floored boundaries,
   * inclusive). Returns one row per step: (step, event_type, n_users,
   * conversion = n_users / step-1 users, both exact counts with one
   * float division). A k-step funnel is k−1 per-user min-aggregation
   * joins — each one shuffle on user_id, no window over the full stream,
   * no driver state. */
  def funnel(events: DataFrame, steps: Seq[String],
      windowMinutes: Int = 60 * 24): DataFrame = {
    require(steps.size >= 2, s"funnel needs at least 2 steps, got $steps")
    require(steps.distinct.size == steps.size, s"funnel steps must be distinct: $steps")
    val ms = tsMillis(events)
    val spark = events.sparkSession
    val winMs = windowMinutes.toLong * 60000L
    def stepEvents(t: String) = events.filter(col("event_type") === t)
      .select(col("user_id"), ms.as("_ms"))
    var matched = stepEvents(steps.head)
      .groupBy("user_id").agg(min(col("_ms")).as("_t"))
      .select(col("user_id"), col("_t"), col("_t").as("_t0"))
      .persist()
    var counts = Vector((1, steps.head, matched.count()))
    for ((t, i) <- steps.tail.zipWithIndex) {
      val next = stepEvents(t).join(matched, "user_id")
        .filter(col("_ms") >= col("_t") && col("_ms") <= col("_t0") + winMs)
        .groupBy("user_id").agg(min(col("_ms")).as("_t"),
          first(col("_t0")).as("_t0"))
        .persist()
      counts = counts :+ ((i + 2, t, next.count()))
      matched.unpersist(false)
      matched = next
    }
    matched.unpersist(false)
    val n1 = counts.head._3
    import spark.implicits._
    counts.map { case (s, t, n) =>
      (s, t, n, if (n1 == 0) null else java.lang.Double.valueOf(n.toDouble / n1.toDouble))
    }.toDF("step", "event_type", "n_users", "conversion")
  }

  /** Weekly cohort retention: users bucketed by the epoch week
   * (floor(ms / 7·86400000)) of their FIRST event; one row per
   * (cohort_week, week_offset) with the distinct active users. Exact
   * integer week math — no calendar/timezone dependency, identical in
   * any SQL engine. Two shuffles: the per-user first-event aggregation
   * and the (cohort, offset) distinct count. */
  def cohortRetention(events: DataFrame): DataFrame = {
    // (ms − ms mod w) / w: the numerator is an exact multiple of w and
    // the integer quotient is far below 2^53, so the double division is
    // EXACT — a bare ms/w cast-to-long could truncate a float hair below
    // the true week at bucket boundaries
    val ms = tsMillis(events)
    val w7 = lit(604800000L)
    val wk = ((ms - pmod(ms, w7)) / w7).cast("long")
    val userWeeks = events.select(col("user_id"), wk.as("_wk"))
    val cohorts = userWeeks.groupBy("user_id").agg(min(col("_wk")).as("_c"))
    userWeeks.join(cohorts, "user_id")
      .groupBy(col("_c").as("cohort_week"),
        (col("_wk") - col("_c")).as("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_users"))
  }

  /** Linear multi-touch attribution: every `convType` event distributes
   * ONE unit of credit equally across the same user's `touchType` events
   * in the `windowMinutes` before it (boundary inclusive on both ends,
   * millisecond floor — the [[tsMillis]] convention); a touch collects
   * credit from every conversion whose window it falls in. Returns one
   * row per credited touch: (event_id, user_id, n_conversions, credit)
   * with credit = Σ 1/n_touches(conversion), rounded to 4dp.
   *
   * Shape: one equi-join on user_id with the range predicate riding it
   * (per-user fan-out is bounded by activity × window — the funnel/as-of
   * family's shape, never a cross join), one count per conversion, one
   * sum per touch. First/last-touch variants are [[asofJoin]] with
   * backward/forward direction; this is the equal-split spelling. */
  def linearAttribution(events: DataFrame, touchType: String = "view",
      convType: String = "purchase", windowMinutes: Int = 1440): DataFrame = {
    val ms = tsMillis(events)
    val touches = events.filter(col("event_type") === touchType)
      .select(col("event_id"), col("user_id"), ms.as("_tms"))
    val convs = events.filter(col("event_type") === convType)
      .select(col("event_id").as("_cid"), col("user_id"), ms.as("_cms"))
    val pairs = touches.join(convs, Seq("user_id"))
      .filter(col("_tms") <= col("_cms") &&
        col("_tms") >= col("_cms") - windowMinutes * 60000L)
    val perConv = pairs.groupBy("_cid").agg(count(lit(1)).as("_n"))
    pairs.join(perConv, "_cid")
      .groupBy(col("event_id"), col("user_id"))
      .agg(count(lit(1)).as("n_conversions"),
        round(sum(lit(1.0) / col("_n")), 4).as("credit"))
  }

  /** RFM user segmentation: per user, Recency (epoch day of the last
   * event), Frequency (event count) and Monetary (exact cent sum —
   * `floor(value·100)` per event, so the aggregate is an order-
   * independent integer, never a float whose bits depend on partial-sum
   * order), then `buckets`-quantile scores per dimension. Bucket 1 is
   * BEST (most recent / most frequent / highest spend); ties break on
   * user_id, a total order, so the segmentation is deterministic under
   * any partitioning.
   *
   * Scale: the aggregation is one hash shuffle on user_id; each ntile is
   * a global sort OF USER AGGREGATES (rows = users, not events) — the
   * classic exact formulation. For billions of users swap the ntiles for
   * approx-percentile cut points; exact quantile membership is the
   * contract here. */
  def rfm(events: DataFrame, buckets: Int = 5): DataFrame = {
    require(buckets >= 2, s"rfm needs >= 2 buckets, got $buckets")
    val agg = events
      .withColumn("_ms", tsMillis(events))
      .groupBy("user_id")
      .agg(expr("max(_ms) div 86400000").as("recency_day"),
        count(lit(1)).as("frequency"),
        sum(floor(col("value") * 100).cast("long")).as("monetary_cents"))
    def score(c: String) =
      ntile(buckets).over(Window.orderBy(col(c).desc, col("user_id").asc))
    agg.select(col("user_id"), col("recency_day"), col("frequency"),
      col("monetary_cents"), score("recency_day").as("r"),
      score("frequency").as("f"), score("monetary_cents").as("m"))
  }

  /** Per-session event-type paths: gap-sessionize (same rule and
   * (ts, event_id) total order as [[sessionize]]), keep each session's
   * first `maxSteps` events, and render the ordered type sequence as a
   * `>`-joined string. Returns (user_id, session_idx, path, n_steps).
   *
   * One shuffle on user_id drives both window passes (same partitioning,
   * no re-exchange), then one hash aggregation per session assembles the
   * path via `array_sort(collect_list(struct(rn, type)))` — the sort key
   * rn is unique within the group, so the path is deterministic under
   * any task ordering. Per-group state is bounded by `maxSteps`, never
   * by session length. */
  def sessionPaths(events: DataFrame, gapMinutes: Int = 30,
      maxSteps: Int = 5): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ms = tsMillis(events)
    val newSession = when(
      ms - lag(ms, 1).over(byUser) > gapMinutes * 60L * 1000L, 1).otherwise(0)
    val sess = events
      .withColumn("_sess", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val bySess = Window.partitionBy(col("user_id"), col("_sess"))
      .orderBy(col("ts"), col("event_id"))
    sess.withColumn("_rn", row_number().over(bySess))
      .filter(col("_rn") <= maxSteps)
      .groupBy(col("user_id"), col("_sess").as("session_idx"))
      .agg(
        array_join(transform(
          array_sort(collect_list(struct(col("_rn"), col("event_type")))),
          x => x.getField("event_type")), ">").as("path"),
        count(lit(1)).as("n_steps"))
  }

  /** Top-k session paths by frequency — the clickstream "what do users
   * do" sweep. Deterministic cut: (n_sessions desc, path asc) is a total
   * order, executed as a distributed TakeOrdered (no global sort
   * materialization). Returns (path, n_sessions). */
  /** Epoch-ms column for an arbitrary timestamp-ish column (the
   * [[tsMillis]] rule generalized beyond the literal "ts" column). */
  private def msOf(df: DataFrame, c: String): org.apache.spark.sql.Column =
    df.schema(c).dataType match {
      case org.apache.spark.sql.types.LongType => expr(s"$c div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col(c).cast("timestamp"))
      case _ => unix_millis(col(c))
    }

  /**
   * Range join: match every LEFT (point) row to the RIGHT (interval)
   * rows satisfying `rightStart ≤ leftTs < rightEnd` and sharing the
   * `on` keys — point-in-interval lookup ("which incident windows was
   * this purchase inside", "which campaign was live at click time").
   *
   * Spark-first plan — the standard bucketized range join (the shape
   * Databricks' range-join hints and Flink's interval joins compile to),
   * NOT a broadcast-nested-loop: time is cut into fixed `bucketMs`
   * buckets; each point keys to ITS bucket, each interval explodes to
   * every bucket it spans, and the match becomes one EQUI-join on
   * (keys…, bucket) with the exact range predicate riding it as a
   * residual filter. Each (point, interval) pair meets in exactly one
   * bucket — the point's — so no dedup pass is needed. The interval
   * fan-out is span/bucketMs rows; intervals spanning more than
   * `maxBucketsPerInterval` buckets FAIL LOUDLY in-plan (size bucketMs
   * to your typical interval — one unbounded interval would otherwise
   * replicate across the whole timeline). Empty/negative intervals
   * match nothing and are dropped.
   *
   * Returns every left column plus each of `rightCols` as
   * `prefix + name`. Inner join; `on` may be empty (pure range join —
   * the bucket is then the only equi key, so partition-level parallelism
   * comes from time itself).
   */
  def rangeJoin(left: DataFrame, right: DataFrame, on: Seq[String],
      leftTs: String, rightStart: String, rightEnd: String,
      rightCols: Seq[String], prefix: String = "r_",
      bucketMs: Long = 3600000L, maxBucketsPerInterval: Int = 1024): DataFrame = {
    require(bucketMs >= 1, s"bucketMs must be >= 1: $bucketMs")
    require(maxBucketsPerInterval >= 1,
      s"maxBucketsPerInterval must be >= 1: $maxBucketsPerInterval")
    require(rightCols.nonEmpty, "rangeJoin needs rightCols to return")
    val l = left.withColumn("_lms", msOf(left, leftTs))
      .withColumn("_b", expr(s"_lms div $bucketMs"))
    val span = expr(s"(_re - 1) div $bucketMs") - expr(s"_rs div $bucketMs") + 1
    val r = right
      .select((on.map(col) ++ rightCols.map(c => col(c).as(prefix + c))) :+
        msOf(right, rightStart).as("_rs") :+ msOf(right, rightEnd).as("_re"): _*)
      .filter(col("_re") > col("_rs")) // empty intervals match nothing
      .withColumn("_b", explode(sequence(
        when(span > maxBucketsPerInterval, raise_error(concat(
          lit(s"rangeJoin: an interval spans more than " +
            s"$maxBucketsPerInterval buckets of $bucketMs ms (start="),
          col("_rs").cast("string"), lit(", end="), col("_re").cast("string"),
          lit(") — raise bucketMs or maxBucketsPerInterval, or cap the " +
            "interval; an unbounded interval would replicate across the " +
            "whole timeline"))))
          .otherwise(expr(s"_rs div $bucketMs")),
        expr(s"(_re - 1) div $bucketMs"))))
    l.join(r, on :+ "_b")
      .filter(col("_lms") >= col("_rs") && col("_lms") < col("_re"))
      .select(left.columns.map(col) ++ rightCols.map(c => col(prefix + c)): _*)
  }

  /** First-order Markov transition matrix over session event sequences:
   * within each gap-session (same rule as [[sessionize]]), count every
   * consecutive event-type pair, then normalize per source type.
   * Returns (src_type, dst_type, n, n_src, p) with p = n / n_src rounded
   * to 6 — counts are exact integers, so the only float is one division.
   * Plan: ONE user-keyed window pass (sessionize + lead ride the same
   * exchange) into a hash aggregation whose key space is event-type² —
   * tiny regardless of corpus size; the per-source totals re-aggregate
   * the pair counts, never the events. */
  def transitionMatrix(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val ms = tsMillis(events)
    val newSession = when(
      ms - lag(ms, 1).over(byUser) > gapMinutes * 60L * 1000L, 1).otherwise(0)
    val pairs = events
      .withColumn("_sess", sum(newSession).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      // lead over the SAME user-keyed window (one exchange + sort total);
      // a next row in a different session is not a transition
      .withColumn("_next",
        when(lead(col("_sess"), 1).over(byUser) === col("_sess"),
          lead(col("event_type"), 1).over(byUser)))
      .filter(col("_next").isNotNull)
      .groupBy(col("event_type").as("src_type"), col("_next").as("dst_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy("src_type").agg(sum(col("n")).as("n_src"))
    pairs.join(broadcast(totals), "src_type")
      .select(col("src_type"), col("dst_type"), col("n"), col("n_src"),
        round(col("n") / col("n_src"), 6).as("p"))
  }

  def topPaths(events: DataFrame, gapMinutes: Int = 30, maxSteps: Int = 5,
      k: Int = 20): DataFrame =
    sessionPaths(events, gapMinutes, maxSteps)
      .groupBy("path").agg(count(lit(1)).as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path").asc)
      .limit(k)
}
