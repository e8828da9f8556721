package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic release of the executor blocks pinned by a
  * `localCheckpoint()`ed DataFrame. Spark offers no public unpersist for
  * checkpoints — blocks are freed only when the ContextCleaner notices
  * the RDD is unreachable after a GC, which is far too lazy for an
  * iterative algorithm that supersedes a checkpoint every round (the
  * blocks of every round would coexist until some future GC). The
  * checkpointed data lives in the RDD captured by the plan's
  * `LogicalRDD` leaf; dropping it there frees the blocks immediately.
  *
  * Safe ONLY once nothing will read `df`'s plan again — the lineage was
  * truncated, so a post-free action on `df` would fail rather than
  * recompute.
  */
object CheckpointBridge {
  def free(df: DataFrame): Unit =
    df.queryExecution.analyzed.collectLeaves().foreach {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
