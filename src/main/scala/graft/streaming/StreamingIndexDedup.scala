package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Streaming incremental dedup against a PERSISTED MinHash index —
  * the ingest-time composition of [[graft.operators.Dedup
  * .probeMinhashIndex]]: each micro-batch of a new-crawl stream is
  * probed against the training-set index and only documents with NO
  * near-duplicate in the reference survive to the sink. This is the
  * shape a production ingest runs continuously: the reference side
  * was banded/shingled once at index build; each batch pays only its
  * own signatures (bounded by the batch, not the corpus).
  *
  * Semantics: filtering is against the FIXED reference index only —
  * batch-vs-batch and within-batch duplicates are deliberately left
  * to the upstream [[StreamingDedup]] stage (watermarked exact dedup)
  * or a periodic batch pass; a stream that also appended its own
  * survivors to the index would make results order-dependent, which
  * breaks the exactly-reproducible contract every gated operator here
  * keeps. Because each batch is filtered independently against a
  * fixed index, the stream output over any file set equals the batch
  * [[Dedup.probeMinhashIndex]] anti-join over the same rows — gated
  * by the driver query against the same all-pairs oracle.
  *
  * Delivery: replay-safe via [[IdempotentSink]] — a micro-batch that
  * crashed after its append but before the checkpoint commit is
  * skipped on replay (marker under `<sink>/_batches/`), so the sink
  * holds each surviving row once; only the marker idiom's residual
  * window (crash exactly between append and marker) can re-append.
  */
object StreamingIndexDedup {

  /** Run `stream` (a streaming DataFrame of documents) through
    * index-probe dedup, appending surviving rows to a parquet sink.
    * Returns after the stream terminates (AvailableNow-style callers
    * await inside). Columns are passed through unchanged.
    *
    * The index state — meta parameters and the band/shingle read
    * plans — is loaded ONCE before the stream starts and reused by
    * every micro-batch ([[Dedup.loadMinhashIndex]] +
    * [[Dedup.probeMinhashIndexWith]]): a continuous ingest at
    * seconds-level triggers pays zero fixed per-batch driver work for
    * the index side (previously a meta parquet job + two re-planned
    * reads per batch). */
  def run(spark: SparkSession, stream: DataFrame, indexPath: String,
          idCol: String, textCol: String, threshold: Double,
          sinkPath: String, checkpoint: String): Unit = {
    val indexState = Dedup.loadMinhashIndex(spark, indexPath)
    runWithState(indexState, stream, idCol, textCol, threshold,
      sinkPath, checkpoint)
  }

  /** [[run]] with the index state already loaded — callers sharing one
    * index across several streams load it once for all of them. */
  def runWithState(indexState: Dedup.MinhashIndexState, stream: DataFrame,
                   idCol: String, textCol: String, threshold: Double,
                   sinkPath: String, checkpoint: String): Unit = {
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val b = batch.persist()
        try {
          val dupIds = Dedup.probeMinhashIndexWith(
              indexState, b.toDF(), idCol, textCol, threshold)
            .select(col("corpus_id").as("__dup_id")).distinct()
          // replay-safe: a crash-replayed batch must not duplicate its
          // surviving rows in the sink (IdempotentSink marker contract)
          IdempotentSink.appendOnce(
            b.join(dupIds, b(idCol).cast("long") === col("__dup_id"),
              "left_anti"),
            sinkPath, batchId)
        } finally b.unpersist()
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
