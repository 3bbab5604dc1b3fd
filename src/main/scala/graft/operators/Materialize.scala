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
}
