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
  private[pipeline] def ensureParallelism(df: DataFrame): DataFrame = {
    // streaming frames have no static partitioning to probe (and .rdd is
    // illegal on them); micro-batch parallelism comes from the source
    if (df.isStreaming) return df
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
}
