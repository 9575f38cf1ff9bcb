package graft.lib

import scala.collection.mutable
import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/**
 * Driver-side memory/lineage manager for iterative DataFrame algorithms.
 *
 * Every iterative operator has the same three problems (reference
 * re-implements this queue five times, e.g. lib/Pregel.scala:392-545,
 * lib/AggregateNeighbors.scala:307-412):
 *  1. the logical plan grows per iteration and eventually hangs the driver
 *     → cut lineage with `localCheckpoint`/`checkpoint` every
 *     `checkpointInterval` rounds;
 *  2. each round re-reads the previous round's frame → persist it;
 *  3. persisted frames from two rounds ago leak memory → unpersist once a
 *     newer round has been materialized.
 *
 * Usage per round: `df = mgr.cycle(df, round)`. The returned frame is
 * persisted (and possibly checkpointed); the frame from the previous cycle
 * is unpersisted only after the new one is materialized, so recomputation
 * never cascades.
 */
private[graft] object IterationManager {
  /** (scheme, normalized path) of a dir given as a plain path or a URI;
   * plain paths get scheme "file" so `/x` and `file:/x` compare equal. */
  private def uriParts(s: String): (String, String) =
    try {
      val u = new java.net.URI(s)
      val path = Option(u.getPath).filter(_.nonEmpty).getOrElse(s)
      (Option(u.getScheme).getOrElse("file"), path.stripSuffix("/"))
    } catch { case _: Exception => ("file", s.stripSuffix("/")) }

  /** Build a manager honoring an optional reliable-checkpoint directory:
   * when set, lineage cuts go through `df.checkpoint()` into the cluster
   * filesystem (surviving executor loss — a 100-round iteration resumes
   * from the last cut instead of restarting), at the cost of FS writes;
   * when unset, the default `localCheckpoint` keeps blocks in executor
   * storage (fastest, but executor loss restarts the iteration).
   * NOTE: Spark's checkpoint directory is session-global — the last
   * algorithm to set one wins for concurrent runs (set only when it
   * actually differs to avoid churn). Checkpoint files are NOT deleted on
   * [[IterationManager.close]]: `ReliableRDDCheckpointData` cleanup only
   * runs when `spark.cleaner.referenceTracking.cleanCheckpoints=true` is
   * set at context creation; otherwise callers own the directory and
   * should prune it between runs. */
  def withReliableDir(spark: org.apache.spark.sql.SparkSession,
      dir: Option[String], checkpointInterval: Int = 2,
      storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK): IterationManager = {
    // session-wide opt-in to reliable cuts (spark.graft.useLocalCheckpoints
    // = false, parity with reference GraphFramesConf.scala:9-19): algorithms
    // without an explicit dir checkpoint into the context's checkpoint dir
    val effective = dir.orElse {
      if (graft.GraftConf.useLocalCheckpoints.contains(false))
        Some(spark.sparkContext.getCheckpointDir.getOrElse(throw new java.io.IOException(
          s"${graft.GraftConf.UseLocalCheckpointsKey}=false requires " +
            "SparkContext.setCheckpointDir (reliable checkpoints need a cluster-visible dir)")))
      else None
    }
    effective match {
      case Some(d) =>
        // Spark appends a /<uuid> component under the requested dir and
        // reports it back as a URI (file:/..., hdfs://...), so "already
        // set here" = same scheme AND exact path match or a direct
        // path-component child ("/ckpt/a" must NOT match "/ckpt/ab-uuid")
        val (dScheme, dPath) = uriParts(d)
        val alreadySet = spark.sparkContext.getCheckpointDir.exists { p =>
          val (pScheme, pPath) = uriParts(p)
          pScheme == dScheme && (pPath == dPath || pPath.startsWith(dPath + "/"))
        }
        if (!alreadySet) spark.sparkContext.setCheckpointDir(d)
        new IterationManager(checkpointInterval, storageLevel, useLocalCheckpoint = false)
      case None => new IterationManager(checkpointInterval, storageLevel)
    }
  }

  /** Eagerly free the block-manager storage behind a frame returned from
   * [[IterationManager.finish]] (its `LogicalRDD` blocks). Call only when
   * the frame's data is no longer needed — it cannot be recomputed. */
  def release(df: DataFrame): Unit = {
    val live = df.sparkSession.sparkContext.getPersistentRDDs
    org.apache.spark.sql.graftshim.GraftShims.logicalRddIds(df)
      .foreach(id => live.get(id).foreach(_.unpersist(false)))
  }
}

private[graft] class IterationManager(
    checkpointInterval: Int = 2,
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    useLocalCheckpoint: Boolean = true) {

  /** A tracked round frame plus the ids of any RDDs its lineage cut
   * persisted at the RDD level. `Dataset.unpersist` only talks to the
   * CacheManager, and a localCheckpoint'ed frame is persisted by the
   * block manager directly (never registered there) — so without the id
   * list every cut would leak one RDD of full iteration state until the
   * ContextCleaner's GC-driven sweep got around to it (the reference
   * guards this with ConnectedComponentsSuite.scala:311 "not leaking
   * cached data").
   *
   * `viaDatasetPersist` records HOW the frame was pinned. A cut frame was
   * never `Dataset.persist`ed — calling `df.unpersist` on it anyway is not
   * a harmless no-op: `uncacheQuery` drops every cache entry whose plan is
   * `sameResult` with the cut's `LogicalRDD`, and a caller's final result
   * that happens to be a no-op projection of the last round's state (e.g.
   * fixed-iteration PageRank, where no voting column is dropped)
   * canonicalizes to exactly that plan. Freeing the cut then silently
   * uncached the caller's materialized result AND deleted the checkpoint
   * blocks it would recompute from — CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND on
   * the next action (the round-6 g_pagerank/g_cycles/g_lpa/g_scc outage). */
  private case class Entry(df: DataFrame, rddIds: Seq[Int], viaDatasetPersist: Boolean)
  private val persisted = mutable.Queue.empty[Entry]
  private val sideFrames = mutable.ArrayBuffer.empty[DataFrame]

  // NOTE on cadence (round-8 experiment, kept for the record): stretching
  // the cut interval when the state frame is tiny — "skip eager cuts,
  // persist lazily, let the next action compute through" — was built and
  // MEASURED WORSE, badly: 5-round HITS went 3.2 s → 73 s at an 8x
  // stretch and 9.3 s at 2x. An iterative round references the previous
  // state more than once (self-joins), so every lazy (un-materialized)
  // round DOUBLES the logical tree the analyzer walks — 4^rounds subplan
  // copies for HITS's two-self-join rounds. Eager cuts are precisely what
  // keep analysis linear; the per-cut job (~0.4 s at local[16] scheduler
  // floor) is the cheap part. Small-graph latency is instead handled
  // where it belongs: bounded driver-side tails in the algorithms
  // themselves (ConnectedComponents.finishWithUnionFind, Hits/Katz
  // localIterate), same pattern, measured 2-6x on the nations graphs.

  private def free(e: Entry): Unit = {
    if (e.viaDatasetPersist) e.df.unpersist(false)
    if (e.rddIds.nonEmpty) {
      val live = e.df.sparkSession.sparkContext.getPersistentRDDs
      e.rddIds.foreach(id => live.get(id).foreach(_.unpersist(false)))
    }
  }

  /** Persist + (on checkpoint rounds) truncate lineage and materialize.
   * Non-checkpoint rounds persist lazily — the next materializing action
   * computes through (and caches) them, so each `checkpointInterval`
   * window costs ONE job instead of one per round. Older caches are only
   * dropped once a newer frame has actually been materialized. */
  /** [[cycle]] with a convergence metric FUSED into the materializing job:
   * observes `metric` (an aggregate over the frame's rows, e.g.
   * `count(when(improved, 1))`) via `Dataset.observe` so the cut's own
   * action reports it — the caller's follow-up `count()`/`isEmpty` job,
   * historically HALF the per-round job count of the small iterative
   * operators, disappears. Always cuts (the metric must be backed by a
   * completed action or `Observation.get` blocks), so callers pass
   * `checkpointInterval = 1` and drop their separate convergence action.
   * Eager `localCheckpoint`/`checkpoint` run through `Dataset.withAction`,
   * which fires the SQL-execution events observations listen on — probed
   * on Spark 4.1 before relying on it here. */
  def cycleCounted(df: DataFrame, round: Int,
      metric: org.apache.spark.sql.Column): (DataFrame, Long) = {
    val obs = org.apache.spark.sql.Observation(s"graft_cycle_${round}_" +
      java.util.UUID.randomUUID().toString)
    val observed = df.observe(obs, metric.as("_m"))
    val c = cycleAt(observed, round, force = true)
    val m = obs.get("_m") match {
      case null => 0L
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalStateException(
        s"cycleCounted metric must be numeric, got $other")
    }
    (c, m)
  }

  /** [[cycleCounted]] generalized to SEVERAL metrics of any numeric type:
   * observes each aggregate on the cut's own materializing job and
   * returns their values in order (null where the frame was empty). The
   * power-iteration family fuses its overflow-guard maxes and its final
   * normalization statistics (L2/L1 norms, sup-norm) into the chunk cut
   * this way — zero separate driver actions per loop beyond the cuts
   * themselves. Always cuts, like [[cycleCounted]]. */
  def cycleObserved(df: DataFrame, round: Int,
      metrics: Seq[org.apache.spark.sql.Column]): (DataFrame, Seq[Any]) = {
    require(metrics.nonEmpty, "cycleObserved needs at least one metric")
    val obs = org.apache.spark.sql.Observation(s"graft_cycle_${round}_" +
      java.util.UUID.randomUUID().toString)
    val named = metrics.zipWithIndex.map { case (m, i) => m.as(s"_m$i") }
    val c = cycleAt(df.observe(obs, named.head, named.tail: _*), round,
      force = true)
    val got = obs.get
    (c, metrics.indices.map(i => got(s"_m$i")))
  }

  def cycle(df: DataFrame, round: Int): DataFrame =
    cycleAt(df, round, force = false)

  private def cycleAt(df: DataFrame, round: Int, force: Boolean): DataFrame = {
    val doCheckpoint = force ||
      (checkpointInterval > 0 && round % checkpointInterval == 0)
    if (doCheckpoint) {
      // localCheckpoint(eager=true) truncates lineage into executor block
      // storage; `reliable` checkpoint needs a checkpoint dir and spills
      // to the cluster FS — slower but survives executor loss. The
      // pre-checkpoint cache only exists so the checkpoint job computes
      // the frame once; drop it as soon as the files are written or every
      // cut leaks one cached copy of the full iteration state.
      val sc = df.sparkSession.sparkContext
      val before = sc.getPersistentRDDs.keySet
      val c = if (useLocalCheckpoint) df.localCheckpoint(true)
      else {
        val p = df.persist(storageLevel)
        val x = p.checkpoint(true)
        p.unpersist(false)
        x
      }
      // RDDs persisted by this cut (and any lazy prior-round caches the
      // cut's job happened to materialize — double-freeing those later is
      // a no-op); ids, not references, so dropped entries don't pin
      // lineage objects
      val added = (sc.getPersistentRDDs.keySet -- before).toSeq
      persisted.enqueue(Entry(c, added, viaDatasetPersist = false))
      // everything older than this materialized frame is now safe to drop
      while (persisted.size > 1) free(persisted.dequeue())
      c
    } else if (checkpointInterval <= 0) {
      // checkpointing disabled: materialize every round (plan keeps
      // growing — caller opted out of lineage cuts)
      val p = df.persist(storageLevel)
      p.count()
      persisted.enqueue(Entry(p, Nil, viaDatasetPersist = true))
      while (persisted.size > 1) free(persisted.dequeue())
      p
    } else {
      val p = df.persist(storageLevel)
      persisted.enqueue(Entry(p, Nil, viaDatasetPersist = true))
      p
    }
  }

  /** Materialize + persist without lineage truncation (for side frames);
   * tracked and released by [[close]]. */
  def persistOnly(df: DataFrame): DataFrame = {
    val p = df.persist(storageLevel)
    p.count()
    sideFrames += p
    p
  }

  /** Persist WITHOUT materializing: the side frame's first consumer job
   * computes and caches it (one job saved vs [[persistOnly]] — the right
   * call when the first consumer runs immediately anyway); tracked and
   * released by [[close]]. */
  def persistLazy(df: DataFrame): DataFrame = {
    val p = df.persist(storageLevel)
    sideFrames += p
    p
  }

  /** Materialize a final result SELF-CONTAINED, then drop every tracked
   * cache — the only safe way to hand a frame out of an iteration.
   *
   * Why `persist + count + close` is NOT safe: the result is usually a
   * projection (often a no-op or rename-only one) of the last round's
   * state, and such plans canonicalize `sameResult` with the state frame
   * itself — so [[close]]'s `Dataset.unpersist` on the state entry
   * silently removes the RESULT's cache entry too, and the later
   * recompute dies on the checkpoint blocks [[close]] freed
   * (CHECKPOINT_RDD_BLOCK_ID_NOT_FOUND; the round-6 outage across every
   * fixed-iteration algorithm). A lineage cut has no such alias: the
   * returned frame reads only its own blocks, immune to any CacheManager
   * bookkeeping, and [[close]] can then free the whole queue.
   *
   * The result's blocks live outside the CacheManager; `Dataset.unpersist`
   * on it is a no-op. They are reclaimed when the frame is GC'd
   * (ContextCleaner), or eagerly via [[IterationManager.release]]. */
  def finish(df: DataFrame): DataFrame = finishAll(Seq(df)).head

  /** [[finish]] for callers with SEVERAL results over the same iteration
   * state (e.g. bridges + articulation points from one BFS forest): every
   * frame is cut/materialized BEFORE the single close, so no result's
   * lineage can reach into blocks the close frees. */
  def finishAll(dfs: Seq[DataFrame]): Seq[DataFrame] = {
    val rs = dfs.map { df =>
      if (useLocalCheckpoint) df.localCheckpoint(true)
      else {
        val p = df.persist(storageLevel)
        val x = p.checkpoint(true)
        p.unpersist(false)
        x
      }
    }
    close()
    rs
  }

  /** Drop every cache still held, including the RDD blocks behind lineage
   * cuts. Callers MUST materialize (persist + count) their final result
   * BEFORE closing: the last cut's blocks are freed here, and a frame
   * whose lineage was truncated into them cannot be recomputed after. */
  def close(keep: DataFrame*): Unit = {
    val keepSet = keep.toSet
    persisted.dequeueAll(_ => true).foreach { e =>
      if (!keepSet.contains(e.df)) free(e)
    }
    sideFrames.foreach { df => if (!keepSet.contains(df)) df.unpersist(false) }
    sideFrames.clear()
  }
}
