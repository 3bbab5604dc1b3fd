package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Streaming lexical retrieval against a PERSISTED BM25 index — the
  * serving-stage composition of [[graft.operators.TextAnalysis
  * .scoreWithBm25StateMulti]] with a QUERY stream, mirroring
  * [[StreamingLmScore]]'s shape with the roles flipped: the CORPUS was
  * tokenized once at index build ([[TextAnalysis.writeBm25Index]]);
  * each micro-batch is a batch of queries (`queryIdCol`, `termCol`
  * rows) and pays only its matched postings. This is the hottest
  * production path a retrieval stack runs — queries arrive
  * continuously, the corpus index is fixed between rebuilds.
  *
  * Batch independence: the index is FIXED and each query's top-k
  * depends only on its own terms, so the stream output over any file
  * set equals the batch [[TextAnalysis.bm25TopKMulti]] over the same
  * queries — PROVIDED each query's term rows arrive within one
  * micro-batch (a query split across batches would be scored once per
  * fragment; stage query batches as whole-query files/messages, the
  * natural unit a serving tier emits). Gated against the same DuckDB
  * mirror as the batch multi-query operator.
  *
  * The driver-side index state — meta (corpus stats + k1/b +
  * tokenization pin) and the postings/dl readers — loads ONCE at
  * stream start ([[TextAnalysis.loadBm25Index]]); micro-batches call
  * the state-passing scorer, so a continuous serving stream pays zero
  * fixed per-batch index-side driver work.
  *
  * Delivery: replay-safe via [[IdempotentSink]] — a micro-batch that
  * crashed after its append but before the checkpoint commit is
  * skipped on replay (marker under `<sink>/_batches/`), so the sink
  * holds each result row once; only the marker idiom's residual
  * window (crash exactly between append and marker) can re-append. */
object StreamingBm25Score {

  /** Score `stream` (a streaming DataFrame of (queryIdCol, termCol)
    * query rows) against the BM25 index at `indexPath`, appending
    * (query_id, rank, doc_id, n_terms, score) rows to a parquet sink.
    * Returns after the stream terminates (AvailableNow-style callers
    * await inside). */
  def run(spark: SparkSession, stream: DataFrame, indexPath: String,
          queryIdCol: String, termCol: String, k: Int,
          sinkPath: String, checkpoint: String,
          maxDf: Long = Long.MaxValue): Unit =
    runWithState(TextAnalysis.loadBm25Index(spark, indexPath), stream,
      queryIdCol, termCol, k, sinkPath, checkpoint, maxDf)

  /** [[run]] with the index state already loaded — callers sharing one
    * index across several streams load it once for all of them. */
  def runWithState(state: TextAnalysis.Bm25IndexState, stream: DataFrame,
                   queryIdCol: String, termCol: String, k: Int,
                   sinkPath: String, checkpoint: String,
                   maxDf: Long = Long.MaxValue): Unit = {
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        IdempotentSink.appendOnce(
          TextAnalysis.scoreWithBm25StateMulti(state, batch.toDF(),
            queryIdCol, termCol, k, maxDf),
          sinkPath, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
