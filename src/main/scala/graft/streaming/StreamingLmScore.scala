package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.TextAnalysis

/** Streaming ingest-time quality scoring against a PERSISTED bigram
  * LM — the composition of [[graft.operators.TextAnalysis
  * .scoreWithLmIndex]] with a document stream, mirroring
  * [[StreamingIndexDedup]]'s shape: the model was trained once at
  * index build ([[TextAnalysis.writeLmIndex]]); each micro-batch pays
  * only its own transitions plus two model-sized joins. Because the
  * model is FIXED, each batch scores independently and the stream
  * output over any file set equals the batch scoring of the same rows
  * — order- and batching-independent by construction (gated against
  * the same mirror as the batch query).
  *
  * The driver-side index state (V and the tokenization pin) loads
  * ONCE at stream start via [[TextAnalysis.readLmMeta]]; micro-batches
  * call the state-passing scorer, so a continuous ingest pays zero
  * fixed per-batch meta reads.
  *
  * Delivery: replay-safe via [[IdempotentSink]] — a micro-batch that
  * crashed after its append but before the checkpoint commit is
  * skipped on replay (marker under `<sink>/_batches/`), so the sink
  * holds each score row once; only the marker idiom's residual window
  * (crash exactly between append and marker) can re-append. */
object StreamingLmScore {

  /** Score `stream` (a streaming DataFrame of documents) against the
    * LM index at `indexPath`, appending (id, n_trans, sum_lp_fp,
    * cross_entropy_bits) rows to a parquet sink. Returns after the
    * stream terminates (AvailableNow-style callers await inside). */
  def run(spark: SparkSession, stream: DataFrame, indexPath: String,
          idCol: String, textCol: String,
          sinkPath: String, checkpoint: String): Unit =
    runWithState(spark, TextAnalysis.readLmMeta(spark, indexPath),
      stream, indexPath, idCol, textCol, sinkPath, checkpoint)

  /** [[run]] with the meta state (`v`) already read — callers sharing
    * one model across several streams read it once for all of them.
    * The model/ctx READERS are also constructed once here (file
    * listing + plan), so a micro-batch pays zero fixed index-side
    * driver work. */
  def runWithState(spark: SparkSession, v: Long, stream: DataFrame,
                   indexPath: String, idCol: String, textCol: String,
                   sinkPath: String, checkpoint: String): Unit = {
    val model = spark.read.parquet(s"$indexPath/model")
    val c1 = spark.read.parquet(s"$indexPath/ctx")
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // replay-safe: a crash-replayed batch must not duplicate its
        // score rows in the sink (IdempotentSink marker contract)
        IdempotentSink.appendOnce(
          TextAnalysis.scoreWithLm(model, c1, v, batch.toDF(), idCol, textCol),
          sinkPath, batchId)
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
