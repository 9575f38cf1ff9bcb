package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured-Streaming forms of the event operators: watermarked tumbling
 * windows and stateful sessionization via `flatMapGroupsWithState`.
 *
 * The batch forms live in [[graft.pipeline.Events]]; these run the same
 * semantics incrementally. At 100 TB/day the windowed aggregation is the
 * shape that matters: state is bounded by (watermark horizon × group
 * cardinality), not input size.
 */
object EventStreams {

  /** Read the events table as a stream (schema from the batch copy;
   * TIMESTAMP(NANOS) surfaced as Long nanos and converted). */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    val schema = spark.read.parquet(s"$dir/events.parquet").schema
    // FileStreamSource requires a directory: stream the sf dir, filtered
    // down to the events file
    val raw = spark.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet").parquet(dir)
    val ms = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        // micros without isAdjustedToUTC; sessions run UTC so the
        // NTZ→TIMESTAMP reinterpretation is identity
        unix_millis(col("ts").cast("timestamp"))
      case _ => unix_millis(col("ts"))
    }
    raw.withColumn("ts_utc", timestamp_millis(ms))
  }

  /** Watermarked tumbling-window aggregation; append-mode emits a window
   * only once the watermark passes its end (`complete = true` skips the
   * watermark for complete-mode sinks, where every window re-emits). */
  def hourlyAggStream(events: DataFrame, watermark: String = "2 hours",
      complete: Boolean = false): DataFrame =
    (if (complete) events else events.withWatermark("ts_utc", watermark))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("sum_value"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Streaming exact dedup: keep the first arrival per key, with state
   * bounded by the watermark horizon (late duplicates beyond it are
   * dropped by the watermark, so state never grows with stream length) —
   * the incremental form of [[graft.pipeline.Dedup.exact]] for event or
   * document streams. `keyCols` should include the content hash. */
  def dedupStream(events: DataFrame, keyCols: Seq[String],
      watermark: String = "2 hours", tsCol: String = "ts_utc"): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keyCols)

  /**
   * Stream-stream interval join (attribution): every `rightType` event by
   * the same user within `[0, windowMinutes]` AFTER each `leftType` event
   * — e.g. purchases within 30 minutes of a click. Both sides carry
   * watermarks and the join condition is a direct event-time range, so
   * Spark derives a state watermark for BOTH join buffers: state is
   * bounded by (watermark horizon + interval) x per-user rate, never by
   * stream length. Returns `(left_id, right_id, user_id, lag_ms)`.
   *
   * Boundary contract: the window test compares RAW event timestamps at
   * full source precision — an event exactly `windowMinutes` after the
   * click matches; one even a microsecond later does not. (Flooring
   * inside the join condition would hide the range from Spark's state-
   * watermark derivation and unbound both join buffers, so the raw-
   * timestamp rule IS the contract.) `lag_ms` is the millisecond FLOOR
   * of that raw lag: with sub-millisecond source timestamps an emitted
   * row's `lag_ms` can equal the window bound while a slightly-later,
   * same-`lag_ms` event is excluded. Sources quantized to whole
   * milliseconds (the `events` fixture) see no difference.
   */
  def intervalJoinStream(events: DataFrame, leftType: String,
      rightType: String, windowMinutes: Int = 30,
      watermark: String = "2 hours", tsCol: String = "ts_utc"): DataFrame = {
    val l = events.filter(col("event_type") === leftType)
      .select(col("event_id").as("left_id"), col("user_id"),
        col(tsCol).as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = events.filter(col("event_type") === rightType)
      .select(col("event_id").as("right_id"), col("user_id").as("r_user"),
        col(tsCol).as("r_ts"))
      .withWatermark("r_ts", watermark)
    l.join(r, col("user_id") === col("r_user") &&
        col("r_ts") >= col("l_ts") &&
        col("r_ts") <= col("l_ts") + expr(s"INTERVAL $windowMinutes MINUTES"))
      .select(col("left_id"), col("right_id"), col("user_id"),
        (unix_millis(col("r_ts")) - unix_millis(col("l_ts"))).as("lag_ms"))
  }

  /** Stream-static enrichment: broadcast-join a static dimension onto an
   * event stream. Stream-static inner joins are stateless — no watermark,
   * no join buffer; Spark re-plans the static side per micro-batch, so a
   * small dimension should be broadcast (forced here) and a huge one
   * should be pre-bucketed instead. The classic fact-stream ×
   * dimension-table shape at any scale. */
  def enrichStream(events: DataFrame, dim: DataFrame,
      leftKey: String, rightKey: String): DataFrame =
    events.join(broadcast(dim), col(leftKey) === col(rightKey))

  /** Streaming heavy hitters, stage 1: per-hour per-type per-user event
   * counts under a watermark. State is bounded by (watermark horizon ×
   * active (type, user) pairs in it), never by stream length. Rank-k
   * cannot run INSIDE a streaming aggregation (window functions need
   * finished groups), so the top-k cut is the batch finisher [[topK]] —
   * apply it per closed window in `foreachBatch` (append mode) or over
   * the final complete-mode table. */
  def userCountsStream(events: DataFrame, watermark: String = "2 hours",
      complete: Boolean = false): DataFrame =
    (if (complete) events else events.withWatermark("ts_utc", watermark))
      .groupBy(window(col("ts_utc"), "1 hour"), col("event_type"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(date_format(col("window.start"), "yyyy-MM-dd HH").as("window_start"),
        col("event_type"), col("user_id"), col("n_events"))

  /** Streaming approximate-distinct users per (hour window, event type) —
   * a KMV (k-minimum-values) sketch as ONE streaming aggregation: the
   * state per group is the k smallest DISTINCT 60-bit md5 fractions of
   * the user ids ([[graft.expressions.KMinSampling.distinctLong]] — the
   * buffer dedups internally, so no second stateful `distinct` operator
   * is needed), merged across micro-batches by the aggregator's partial
   * merge. O(k) state per group however many users stream by; the
   * estimate (k-1)/h_k (exact count below k) replays bit-identically in
   * any engine from the same hashes. Matches the batch
   * [[graft.pipeline.Sampling.approxDistinct]] estimator exactly. */
  def kmvDistinctStream(events: DataFrame, k: Int = 16,
      watermark: String = "2 hours", complete: Boolean = false): DataFrame = {
    require(k >= 3, s"kmvDistinctStream needs k >= 3 (got $k)")
    val h = conv(substring(md5(col("user_id").cast("string")), 1, 15), 16, 10)
      .cast("long")
    val kmin = graft.expressions.KMinSampling.distinctLong(k)
    (if (complete) events else events.withWatermark("ts_utc", watermark))
      .filter(col("user_id").isNotNull && col("event_type").isNotNull)
      .select(window(col("ts_utc"), "1 hour").as("w"), col("event_type"), h.as("_h"))
      .groupBy(col("w"), col("event_type"))
      .agg(kmin(col("_h")).as("_mins"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH").as("window_start"),
        col("event_type"),
        when(size(col("_mins")) < k, size(col("_mins")).cast("double"))
          .otherwise(lit((k - 1).toDouble) /
            (element_at(col("_mins"), k).cast("double") /
              lit(1152921504606846976.0 /* 2^60 */)))
          .as("approx_distinct"))
  }

  /** Streaming heavy hitters, stage 2 (batch finisher): top-k users per
   * (window, type) by count — ties broken by user_id ascending, so the
   * cut is deterministic. One shuffle on the group key, an in-partition
   * rank, no global sort. */
  def topK(counts: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("window_start"), col("event_type"))
      .orderBy(col("n_events").desc, col("user_id").asc)
    counts.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Rate-spike anomaly detection, stage 2 (batch finisher over the
   * watermark-closed windowed counts of [[hourlyAggStream]]): a window is
   * a spike when its count exceeds `num/den` times the mean of that
   * type's previous `lookback` OBSERVED windows — evaluated as the exact
   * integer cross-multiplication `n·lookback·den > num·Σprev`, so there
   * is no float anywhere and any engine replays the flag identically.
   * Windows without a full lookback history report `spike = false` (cold
   * start is not an anomaly). "Previous" means previous EMITTED windows
   * per type (a silent hour produces no row and is skipped), which keeps
   * the rule a pure per-type lag — the streaming stage needs no change
   * and no zero-filling join.
   *
   * Scale: one shuffle on event_type + an in-partition ordered lag — the
   * row count entering this finisher is (windows × types), already
   * aggregated down from the raw stream by stage 1. Returns the counts
   * plus (prev_sum, spike). */
  def rateSpikes(counts: DataFrame, lookback: Int = 3,
      num: Long = 3L, den: Long = 2L): DataFrame = {
    require(lookback >= 1, s"rateSpikes needs lookback >= 1, got $lookback")
    require(num > 0 && den > 0, s"rateSpikes ratio must be positive: $num/$den")
    val w = Window.partitionBy(col("event_type")).orderBy(col("window_start"))
    val prevSum = (1 to lookback)
      .map(i => lag(col("n_events"), i).over(w))
      .reduce(_ + _) // null when any of the lookback lags is missing
    counts.withColumn("prev_sum", prevSum)
      .withColumn("spike",
        coalesce(col("n_events") * lookback * den > lit(num) * col("prev_sum"),
          lit(false)))
  }

  /**
   * Streaming keep-latest-per-key "upsert view" — the CDC materialization
   * shape: for every key, the state of its most recent event so far
   * (max by raw event time, `event_id` tie-break). Declarative Spark-first
   * form: ONE streaming aggregation `max(struct(ts, event_id, payload...))`
   * — struct ordering is lexicographic, so the payload rides along with
   * the (ts, event_id) total order and state per key is a single struct,
   * independent of stream length. Runs in update/complete mode (an
   * aggregation without watermark keeps all keys live — the upsert-view
   * contract; key cardinality bounds state, as in any CDC view).
   *
   * Ordering compares the RAW `ts` column (full source precision), not
   * the ms-floored `ts_utc` — two sub-millisecond-apart events must not
   * fall back to the id tie-break. Returns (key, last_ms, last_event_id,
   * last_event_type, last_value).
   */
  def latestPerKeyStream(events: DataFrame, keyCol: String = "user_id"): DataFrame = {
    val latest = events.groupBy(col(keyCol))
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"),
        col("value"))).as("_l"))
    val ms = events.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => expr("_l.ts div 1000000")
      case org.apache.spark.sql.types.TimestampNTZType =>
        unix_millis(col("_l.ts").cast("timestamp"))
      case _ => unix_millis(col("_l.ts"))
    }
    latest.select(col(keyCol), ms.as("last_ms"),
      col("_l.event_id").as("last_event_id"),
      col("_l.event_type").as("last_event_type"),
      col("_l.value").as("last_value"))
  }

  case class SegOut(doc_id: Long, pos: Int, segment: String, kept: Boolean)

  /**
   * Streaming form of [[graft.pipeline.Dedup.segmentDedup]] (CCNet-style
   * segment-level dedup) for an unbounded document stream: per-segment
   * running counts live in keyed state, and each arriving occurrence is
   * kept while the count so far is within `maxDupCount`.
   *
   * Inherent semantic difference from the batch operator, stated rather
   * than hidden: batch sees the corpus-wide frequency and drops ALL
   * occurrences of an over-frequent segment; a stream cannot retract
   * already-emitted segments, so the FIRST `maxDupCount` occurrences pass
   * and later ones drop (the standard first-arrival-wins streaming dedup
   * contract, same as `dropDuplicatesWithinWatermark`). Within a
   * micro-batch, occurrences are ordered by (doc_id, pos) so replays are
   * deterministic.
   *
   * Scale: state is one Long per distinct segment — the same key space
   * the batch frequency aggregation shuffles — sharded by the segment
   * key across executors. Emits per-segment keep decisions; reassembly
   * (groupBy doc_id, sort by pos) composes downstream or per sink batch.
   */
  /**
   * Streaming steady-state near-dup ingest: every arriving micro-batch of
   * documents is matched against a PERSISTED MinHash index
   * ([[graft.pipeline.Dedup.minhashIndex]] output, typically loaded from
   * parquet) and, when `matchNewPairs`, against the docs that arrived
   * earlier IN THE SAME micro-batch — by running the tested batch
   * operator [[graft.pipeline.Dedup.incrementalNearDups]] inside
   * `foreachBatch`. Each matched pair `(id, match_id, est_jaccard)` is
   * handed to `sink`.
   *
   * Cross-batch contract, stated rather than hidden: with `growIndex`
   * OFF, novel duplicates that arrive in DIFFERENT micro-batches are NOT
   * matched against each other until the corpus index is refreshed to
   * include them — the plain steady-state ingest design (the index
   * refresh cadence bounds the blind window), with zero stream state.
   * With `growIndex` ON the blind window is CLOSED: each micro-batch's
   * fingerprints are computed once, matched, then APPENDED to the live
   * index (after matching, so a doc never matches itself), so later
   * micro-batches dedup against every earlier in-stream document as well
   * as the initial corpus. Ordering contract: within a micro-batch the
   * later doc points at the earlier one (id > match_id); across batches
   * the later BATCH's docs point at earlier batches' docs uncondition-
   * ally. Grow-mode state is the appended fingerprints themselves —
   * O(streamed docs) index rows materialized into executor block storage
   * (`localCheckpoint`), NOT the texts; the growth is in-memory to THIS
   * query and dies with it, so a production restart must rebuild the
   * live index from rows durably written via `indexSink` (called with
   * each batch's fingerprint frame — e.g. a parquet append of the same
   * rows [[graft.pipeline.Dedup.minhashIndex]] wrote for the corpus).
   *
   * Per-batch cost either way is O(batch) signature computation + bucket
   * equi-joins against the index, so this runs at any corpus size the
   * batch operator handles.
   *
   * The index width is validated ONCE here, eagerly, at stream
   * definition (one bounded aggregate over the static index) — the
   * per-batch calls skip the scan but keep the always-on per-row width
   * guard (grow-mode appends are produced by [[graft.pipeline.Dedup
   * .minhashIndex]] with these same parameters, so they cannot drift).
   */
  def incrementalNearDupStream(docs: DataFrame, idCol: String, textCol: String,
      index: DataFrame, sink: (DataFrame, Long) => Unit,
      matchNewPairs: Boolean = true, n: Int = 3, bands: Int = 8,
      rowsPerBand: Int = 2, minEstJaccard: Double = 0.0,
      growIndex: Boolean = false, indexSink: (DataFrame, Long) => Unit = null)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    val numHashes = bands * rowsPerBand
    graft.pipeline.Dedup.validateIndexWidths(index, numHashes)
    var live = index
    docs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (growIndex) {
        // compute the batch's fingerprints ONCE, detached from the
        // streaming source (localCheckpoint), so the same rows can be
        // matched now and live in the index beyond this callback
        val newIdx = graft.pipeline.Dedup
          .minhashIndex(batch, idCol, textCol, n, bands, rowsPerBand)
          .localCheckpoint(true)
        sink(graft.pipeline.Dedup.incrementalNearDupsIndexed(
          newIdx, idCol, live, matchNewPairs, numHashes, minEstJaccard), batchId)
        if (indexSink != null) indexSink(newIdx, batchId)
        live = live.unionByName(newIdx)
      } else {
        // same computed-once discipline as grow mode: the batch frame is
        // a PLAN over the micro-batch's files, and the match consumes the
        // fingerprints in four places (corpus join, self-join both sides,
        // estimate signatures) — without the checkpoint every consumer
        // re-reads the source and re-hashes the batch, which is where the
        // r10 driver-run inflation on this row lived (63.9 s vs the 1.6 s
        // batch twin over identical data)
        val newIdx = graft.pipeline.Dedup
          .minhashIndex(batch, idCol, textCol, n, bands, rowsPerBand)
          .localCheckpoint(true)
        sink(graft.pipeline.Dedup.incrementalNearDupsIndexed(
          newIdx, idCol, index, matchNewPairs, numHashes, minEstJaccard), batchId)
        // unlike grow mode (whose checkpointed frames ARE the live
        // index), this batch's cut is dead once the sink consumed it —
        // release its blocks, or a long-running stream accumulates one
        // checkpointed RDD per micro-batch without bound
        graft.lib.IterationManager.release(newIdx)
      }
    }
  }

  /** Streaming ANN index ingest — the embedding-index twin of grow-mode
   * [[incrementalNearDupStream]]: per micro-batch the new vectors are
   * coded against the FROZEN persisted [[graft.pipeline.Similarity
   * .ivfPqModel]] (cell assignment + PQ codes, one broadcast-model map
   * stage — the vectors themselves are never kept) and appended to the
   * live index with the [[graft.pipeline.Similarity.ivfPqIndexAppend]]
   * contract: re-ingested ids keep the NEWEST row, so replaying a batch
   * is idempotent. Because coding is per-row against the same frozen
   * model, the grown index equals `ivfPqIndex(corpus ∪ batches, model)`
   * EXACTLY at every point — streaming ingest never degrades search vs
   * a from-scratch rebuild, which is what the gate row proves by
   * replaying the batch oracle.
   *
   * `sink` receives the LIVE (grown) index after each batch — serve
   * queries from it via [[graft.pipeline.Similarity.ivfPqSearchIndexed]].
   * State: O(streamed vectors) compact (id, cell, m codes) rows
   * localCheckpointed into THIS query's block storage; like grow-mode
   * dedup, a production restart rebuilds the live index from rows
   * durably appended via `indexSink` (each batch's coded frame — the
   * same rows `ivfPqIndex` wrote for the corpus). The anti-join/union
   * chain deepens by one per batch; steady-state deployments snapshot
   * through `indexSink` and restart from the persisted index, exactly
   * the minhash incremental contract. */
  def annIngestStream(vecs: DataFrame, idCol: String, vecCol: String,
      model: DataFrame, index: DataFrame, sink: (DataFrame, Long) => Unit,
      indexSink: (DataFrame, Long) => Unit = null)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    var live = index
    vecs.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      // code the batch ONCE, detached from the streaming source, so the
      // rows live in the index beyond this callback
      val newIdx = graft.pipeline.Similarity
        .ivfPqIndex(batch, idCol, vecCol, model).localCheckpoint(true)
      live = live.join(newIdx.select(col(idCol)), Seq(idCol), "left_anti")
        .unionByName(newIdx)
      sink(live, batchId)
      if (indexSink != null) indexSink(newIdx, batchId)
    }
  }

  def segmentDedupStream(docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", windowWords: Int = 0,
      maxDupCount: Long = 1, lowercase: Boolean = false): Dataset[SegOut] = {
    import docs.sparkSession.implicits._
    // SegOut carries a Long doc_id; a silent cast would turn string or
    // other non-integral ids into null on EVERY row (collapsing
    // provenance) — reject them at plan time instead (the batch
    // segmentDedup keeps the original id type; map ids to Long upstream)
    docs.schema(idCol).dataType match {
      case _: org.apache.spark.sql.types.ByteType | _: org.apache.spark.sql.types.ShortType |
           _: org.apache.spark.sql.types.IntegerType | _: org.apache.spark.sql.types.LongType => ()
      case other => throw new IllegalArgumentException(
        s"segmentDedupStream: id column '$idCol' must be integral (got $other); " +
          "the streaming state schema keys doc_id as Long — map ids upstream " +
          "(the batch segmentDedup keeps the original id type)")
    }
    val segsExpr = graft.pipeline.Dedup.segments(col(textCol), sep, windowWords)
    val seg0 = docs.select(col(idCol).cast("long").as("doc_id"),
        posexplode(segsExpr).as(Seq("pos", "segment")))
    val keyed = seg0.withColumn("key",
      if (lowercase) lower(col("segment")) else col("segment"))
      .select(col("doc_id"), col("pos"), col("segment"), col("key"))
      .as[(Long, Int, String, String)]
    keyed
      .groupByKey(_._4)
      .flatMapGroupsWithState[Long, SegOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[(Long, Int, String, String)], state: GroupState[Long]) =>
          var n = state.getOption.getOrElse(0L)
          val out = rows.toSeq.sortBy(r => (r._1, r._2)).map { r =>
            n += 1
            SegOut(r._1, r._2, r._3, kept = n <= maxDupCount)
          }
          state.update(n)
          out.iterator
      }
  }

  case class SessionEvent(user_id: Long, ts_ms: Long)
  case class SessionState(start: Long, last: Long, n: Long)
  case class SessionOut(user_id: Long, session_start_ms: Long, n_events: Long, duration_ms: Long)

  /** Stateful gap sessionization: a user's session closes after
   * `gapMinutes` idle. With the default processing-time timeout, idle
   * users' final sessions flush on timeout; pass
   * `GroupStateTimeout.NoTimeout` for finite replays (timeout-driven
   * empty batches otherwise keep `processAllAvailable` spinning). */
  case class FunnelEv(user_id: Long, stp: Int, ts_ms: Long)
  case class FunnelProg(k: Int, anchor: Long, lastT: Long, done: Boolean)
  case class FunnelConv(user_id: Long, anchor_ms: Long, converted_ms: Long,
    duration_ms: Long)

  /**
   * Streaming form of [[graft.pipeline.Events.funnel]], emitting one
   * CONVERSION row per user the moment the final step matches: state is
   * (steps matched, anchor = first step-1 time, last matched time) —
   * three longs per active user, never the event history. Within a
   * micro-batch events are sorted by (ts, step) so batch boundaries
   * don't change results; ACROSS batches each user's events must arrive
   * in event-time order — an event older than the user's funnel state is
   * dropped (the state cannot rewind), which is the documented contract
   * (run behind a watermark-sorted upstream or accept at-arrival-order
   * semantics). Under in-order arrival the emitted set equals the batch
   * operator's converted users with identical anchor/conversion times.
   */
  def funnelStream(events: DataFrame, steps: Seq[String],
      windowMinutes: Int = 60 * 24): Dataset[FunnelConv] = {
    require(steps.size >= 2, s"funnel needs at least 2 steps, got $steps")
    require(steps.distinct.size == steps.size, s"funnel steps must be distinct: $steps")
    import events.sparkSession.implicits._
    val winMs = windowMinutes.toLong * 60000L
    val nSteps = steps.size
    val stpCol = steps.zipWithIndex.tail.foldLeft(
      when(col("event_type") === steps.head, lit(0))) {
      case (acc, (t, i)) => acc.when(col("event_type") === t, lit(i))
    }
    events.filter(col("event_type").isin(steps: _*))
      .select(col("user_id"), stpCol.as("stp"),
        unix_millis(col("ts_utc")).as("ts_ms"))
      .as[FunnelEv]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelProg, FunnelConv](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[FunnelEv], state: GroupState[FunnelProg]) =>
          var st = state.getOption.getOrElse(FunnelProg(0, 0L, 0L, done = false))
          val out = scala.collection.mutable.ArrayBuffer.empty[FunnelConv]
          // (ts, step) order: at equal timestamps the LOWER step matches
          // first, exactly like the batch operator's >= chaining
          rows.toSeq.sortBy(e => (e.ts_ms, e.stp)).foreach { e =>
            if (!st.done) {
              if (st.k == 0) {
                if (e.stp == 0) st = FunnelProg(1, e.ts_ms, e.ts_ms, done = false)
              } else if (e.stp == st.k && e.ts_ms >= st.lastT &&
                  e.ts_ms <= st.anchor + winMs) {
                st = st.copy(k = st.k + 1, lastT = e.ts_ms)
                if (st.k == nSteps) {
                  st = st.copy(done = true)
                  out += FunnelConv(user, st.anchor, e.ts_ms, e.ts_ms - st.anchor)
                }
              }
            }
          }
          state.update(st)
          out.iterator
      }
  }

  def sessionizeStream(events: DataFrame, gapMinutes: Int = 30,
      timeout: org.apache.spark.sql.streaming.GroupStateTimeout =
        GroupStateTimeout.ProcessingTimeTimeout,
      timeoutDurationMs: Option[Long] = None): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    val useTimeout = timeout == GroupStateTimeout.ProcessingTimeTimeout
    val gapMs = gapMinutes * 60L * 1000L
    val idleFlushMs = timeoutDurationMs.getOrElse(gapMs)
    events
      .select(col("user_id"), unix_millis(col("ts_utc")).as("ts_ms"))
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, timeout) {
        (user: Long, rows: Iterator[SessionEvent], state: GroupState[SessionState]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          var cur = state.getOption
          rows.toSeq.sortBy(_.ts_ms).foreach { ev =>
            cur match {
              case Some(s) if ev.ts_ms - s.last <= gapMs =>
                cur = Some(s.copy(last = ev.ts_ms, n = s.n + 1))
              case Some(s) =>
                out += SessionOut(user, s.start, s.n, s.last - s.start)
                cur = Some(SessionState(ev.ts_ms, ev.ts_ms, 1))
              case None =>
                cur = Some(SessionState(ev.ts_ms, ev.ts_ms, 1))
            }
          }
          if (state.hasTimedOut) {
            cur.foreach(s => out += SessionOut(user, s.start, s.n, s.last - s.start))
            state.remove()
          } else {
            cur.foreach { s =>
              state.update(s)
              if (useTimeout) state.setTimeoutDuration(idleFlushMs)
            }
          }
          out.iterator
      }
  }
}
