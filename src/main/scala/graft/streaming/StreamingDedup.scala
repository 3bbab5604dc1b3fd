package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming exact deduplication for document pipelines: emit each
  * distinct text once, keyed by a 64-bit content hash, with state
  * bounded by a watermark.
  *
  * This is the streaming half of `operators.Dedup.exact`: a training-
  * data ingest stream drops repeats before they reach storage. State
  * is one (hash, timestamp) pair per distinct document inside the
  * lateness horizon — `dropDuplicatesWithinWatermark` evicts state for
  * hashes older than the watermark, so memory is O(distinct docs per
  * horizon), not O(stream). A duplicate arriving beyond the horizon is
  * re-emitted (bounded-state tradeoff); the batch `Dedup.exact` pass
  * over the stored corpus catches those stragglers.
  */
object StreamingDedup {

  /** Drop repeated texts from a (possibly streaming) DataFrame.
    * @param lateness watermark horizon bounding the dedup state */
  def dropDuplicateTexts(df: DataFrame, timeCol: String, textCol: String,
                         lateness: String = "1 hour"): DataFrame =
    df.withColumn("__text_hash", xxhash64(col(textCol)))
      .withWatermark(timeCol, lateness)
      .dropDuplicatesWithinWatermark("__text_hash")
      .drop("__text_hash")
}
