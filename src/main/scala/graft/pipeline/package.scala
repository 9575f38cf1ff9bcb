package graft

import org.apache.spark.sql.DataFrame

package object pipeline {
  /**
   * Spread a compute-heavy per-row stage across the cluster when the
   * source has fewer partitions than cores (typical for a small dimension
   * table read from one parquet file — Spark gives it one task and the
   * whole hash/shingle pipeline runs on a single thread).
   *
   * No-op when the scan is already parallel (a 100 TB input is split by
   * `files.maxPartitionBytes` into plenty of tasks; adding a round-robin
   * shuffle there would only move data for nothing).
   */
  /**
   * Release hook for operator-internal shared-frame pins. Some operators
   * `persist` an internal frame their lazy result reads more than once
   * ([[Dedup.fuzzyPairs]]' block-filtered side, [[Recommend]]'s basket
   * pairs, [[Text.tfCosinePairs]]' normalized vectors,
   * [[graft.lib.Cliques]]' oriented edges) — the operator cannot
   * unpersist before the caller materializes, so call this AFTER the
   * result is consumed (written / collected): it uncaches exactly the
   * cached frames the result's plan references, non-cascading. A
   * long-lived session that never releases keeps one pinned frame per
   * operator call in the storage pool until LRU eviction.
   */
  def releaseShared(result: DataFrame): Unit =
    org.apache.spark.sql.graftshim.GraftShims.uncacheReferenced(result)

  private[graft] def ensureParallelism(df: DataFrame): DataFrame = {
    // streaming frames have no static partitioning to probe (and .rdd is
    // illegal on them); micro-batch parallelism comes from the source
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
