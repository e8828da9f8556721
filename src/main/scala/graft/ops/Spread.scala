package graft.ops

import org.apache.spark.sql.DataFrame

/** Rebalance a compact input across the cluster BEFORE a high-fan-out
  * operator (shingle/token explode expands a document corpus 100-1000×).
  *
  * Spark sizes scan partitions by INPUT bytes
  * (`spark.sql.files.maxPartitionBytes`), so a small-but-dense input —
  * one parquet row group, a single small file — arrives as one
  * partition and the entire explode pipeline serializes on one core;
  * AQE cannot help because the imbalance is upstream of the first
  * exchange. The cure is one cheap round-robin shuffle of the COMPACT
  * rows (pre-explosion, so bytes are minimal) when and only when the
  * scan's parallelism is below the cluster's.
  *
  * At full scale this is a no-op: a 100 TB corpus scans as tens of
  * thousands of partitions, `getNumPartitions >= defaultParallelism`
  * holds, and no shuffle is added. It only fires where it pays.
  */
object Spread {
  def fanout(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
