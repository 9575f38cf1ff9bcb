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
private[graft] class IterationManager(
    checkpointInterval: Int = 2,
    storageLevel: StorageLevel = StorageLevel.MEMORY_AND_DISK,
    useLocalCheckpoint: Boolean = true) {

  private val persisted = mutable.Queue.empty[DataFrame]
  private val sideFrames = mutable.ArrayBuffer.empty[DataFrame]

  /** Persist + (maybe) checkpoint `df`, force materialization, then drop the
   * previous round's cache. Returns the frame to use for the next round. */
  def cycle(df: DataFrame, round: Int): DataFrame = {
    val doCheckpoint = checkpointInterval > 0 && round % checkpointInterval == 0
    val out =
      if (doCheckpoint) {
        // localCheckpoint(eager=true) truncates lineage into executor block
        // storage; `reliable` checkpoint needs a checkpoint dir and spills
        // to the cluster FS — slower but survives executor loss.
        if (useLocalCheckpoint) df.localCheckpoint(true)
        else { val c = df.persist(storageLevel).checkpoint(true); c }
      } else {
        val p = df.persist(storageLevel)
        p.count() // materialize so unpersisting the parent is safe
        p
      }
    persisted.enqueue(out)
    while (persisted.size > 1) persisted.dequeue().unpersist(false)
    out
  }

  /** Materialize + persist without lineage truncation (for side frames);
   * tracked and released by [[close]]. */
  def persistOnly(df: DataFrame): DataFrame = {
    val p = df.persist(storageLevel)
    p.count()
    sideFrames += p
    p
  }

  /** Drop every cache still held (call after the final result is persisted
   * by the caller). */
  def close(keep: DataFrame*): Unit = {
    val keepSet = keep.toSet
    (persisted.dequeueAll(_ => true) ++ sideFrames).foreach { df =>
      if (!keepSet.contains(df)) df.unpersist(false)
    }
    sideFrames.clear()
  }
}
