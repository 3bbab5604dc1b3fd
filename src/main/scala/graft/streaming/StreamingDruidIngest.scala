package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming ingestion into REAL Druid v9 segments — the realtime
  * half of Druid's ingestion model (tranquility/kafka-indexing-service
  * territory), expressed as Structured Streaming over the DSv2
  * `druid-segments` write path:
  *
  * each micro-batch appends NEW SHARDS to a shared version
  * (`appendShards` — Druid's append-lock shape), so batches
  * accumulate instead of overshadowing each other, and the datasource
  * is queryable through the same deep-storage discovery after every
  * batch commit.
  *
  * Delivery semantics: at-least-once across driver crashes. A
  * micro-batch that crashes between the segment publish and the
  * checkpoint commit is REPLAYED on restart and appends its rows
  * again — the same contract Druid's pre-exactly-once realtime
  * ingestion had; batch-id marker files under
  * `<root>/<dataSource>/_batches/` suppress replays in the common
  * case (marker written after publish: a crash exactly between
  * publish and marker still re-appends). Compact to an exact batch
  * write (a fresh version) for a correctness fence.
  */
object StreamingDruidIngest {

  /** Start an AvailableNow/continuous stream writing `events` (must
    * carry a druid-writable schema incl. `__time`) into deep storage
    * at `root` as dataSource `dataSource`. */
  def start(events: DataFrame, root: String, dataSource: String,
            checkpoint: String,
            segmentGranularity: String = "DAY",
            version: String = "rt0",
            availableNow: Boolean = true): StreamingQuery = {
    val writer = events.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val marker = new org.apache.hadoop.fs.Path(
          s"$root/$dataSource/_batches/$batchId")
        val fs = marker.getFileSystem(
          df.sparkSession.sparkContext.hadoopConfiguration)
        if (!fs.exists(marker)) {
          df.write.format("druid-segments").mode("append")
            .option("dataSource", dataSource)
            .option("segmentGranularity", segmentGranularity)
            .option("version", version)
            .option("appendShards", "true")
            .save(root)
          fs.create(marker, true).close()
        }
        ()
      }
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .start()
  }
}
