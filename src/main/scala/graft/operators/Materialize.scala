package graft.operators

import org.apache.spark.sql.DataFrame

/** Eager materialization with lineage truncation for multi-consumed
  * or iterated DataFrames.
  *
  * On a real cluster (spark.sparkContext.setCheckpointDir configured)
  * this is a RELIABLE checkpoint — an executor loss recomputes
  * nothing, which matters for iterative algorithms whose truncated
  * lineage would otherwise be unrecoverable. Without a checkpoint dir
  * (tests, single node) it falls back to localCheckpoint: fast,
  * executor-memory-resident. */
private[graft] object Materialize {
  def apply(d: DataFrame): DataFrame =
    if (d.sparkSession.sparkContext.getCheckpointDir.isDefined) d.checkpoint(true)
    else d.localCheckpoint(true)

  /** Row count of a just-[[apply]]'d (checkpointed) DataFrame without
    * a full SQL action: counts the checkpointed RDD directly, skipping
    * the Catalyst analyze/optimize/plan pass a `df.count()` pays
    * (~50-100 ms of driver time per call at any data size — the
    * sized-on-real-count idiom calls this once per operator). Counts
    * are identical: the checkpoint's row set IS the DataFrame. */
  def count(d: DataFrame): Long = d.queryExecution.toRdd.count()
}
