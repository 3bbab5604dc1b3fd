package graft.streaming

import org.apache.spark.sql.DataFrame

/** Replay-safe parquet append for `foreachBatch` sinks — the
  * batch-id marker idiom [[StreamingDruidIngest]] established, shared
  * so every non-Druid streaming sink gets the same delivery contract
  * instead of a bare `mode("append")` (which DUPLICATES a batch's
  * rows when a crash lands between the append and the checkpoint
  * commit and the batch replays).
  *
  * Contract: at-least-once across driver crashes, with replays
  * suppressed by a per-batch marker under `<sink>/_batches/<batchId>`
  * written AFTER the append commits. A crash exactly between the
  * append and the marker still re-appends on restart (the same
  * residual window StreamingDruidIngest documents — closing it needs
  * a transactional sink, which plain parquet is not); a crash
  * anywhere else — including the common one, between the append and
  * the CHECKPOINT commit — replays into an existing marker and is
  * skipped, holding each row exactly once. The `_batches/` directory
  * starts with an underscore, so parquet readers of the sink ignore
  * it (Spark hides `_`/`.`-prefixed paths from file indexes).
  *
  * foreachBatch content determinism is on the source (true for the
  * file and Kafka sources replaying from checkpointed offsets): a
  * replayed batchId re-presents the same rows, so skipping it is
  * sound.
  *
  * Markers are keyed by BATCH ID, which is only meaningful relative
  * to the stream's CHECKPOINT: the two form one unit of state.
  * Resetting/deleting the checkpoint restarts batchIds at 0, and a
  * fresh stream's batch 0 would then hit the PRIOR run's marker and
  * be silently SKIPPED — data loss, worse than the duplication the
  * marker exists to stop. Likewise two streams sharing one sink
  * collide on batchIds. Operational contract: wipe `<sink>/_batches/`
  * together with the checkpoint, and give each stream writing a sink
  * its own sink directory (or its own markerDir via [[oncePerBatch]]),
  * exactly as each needs its own checkpoint. */
object IdempotentSink {

  /** Append `df` to the parquet directory `sinkPath` exactly once per
    * `batchId`: a replayed micro-batch whose marker exists is a
    * no-op. Call from inside `foreachBatch` with its batchId. */
  def appendOnce(df: DataFrame, sinkPath: String, batchId: Long): Unit =
    oncePerBatch(df.sparkSession, s"$sinkPath/_batches", batchId) {
      df.write.mode("append").parquet(sinkPath)
    }

  /** The marker idiom for ANY effectful per-batch body (an index
    * append, a segment publish): run `body` unless `markerDir`
    * already holds this batchId's marker; write the marker AFTER the
    * body commits. Same residual window as [[appendOnce]]. */
  def oncePerBatch(spark: org.apache.spark.sql.SparkSession,
                   markerDir: String, batchId: Long)(body: => Unit): Unit = {
    val marker = new org.apache.hadoop.fs.Path(s"$markerDir/$batchId")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) {
      body
      fs.create(marker, true).close()
    }
  }
}
