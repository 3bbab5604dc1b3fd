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
  * micro-batch (stage query batches as whole-query files/messages,
  * the natural unit a serving tier emits). That proviso is ENFORCED,
  * not just documented: every committed batch leaves a small `_ids`
  * manifest beside its parquet; a run folds each manifest ONCE into
  * sorted primitive arrays (16 bytes per distinct id the sink has
  * ever served — compact and flat, with per-batch work just binary
  * searches; archiving old batch dirs bounds both the arrays and the
  * fold, the archived batches simply leaving the guarded history),
  * and a batch presenting an id FIRST SERVED BY A DIFFERENT BATCH
  * refuses loudly — a misconfigured stage that fragments a query gets
  * an error naming the ids, never a silent once-per-fragment scoring.
  * `refuseSplitQueries = false` opts out for sources that legitimately
  * re-serve ids (at the documented per-fragment-scoring risk).
  * Gated against the same DuckDB mirror as the batch operator.
  *
  * Sink layout + delivery: each micro-batch OVERWRITES its own
  * deterministic directory `<sink>/batch-<batchId>/` — so a batch
  * that wrote but crashed before its marker/checkpoint CONVERGES on
  * replay (same batchId, same rows under the foreachBatch determinism
  * rule, overwrite of its own directory) instead of duplicating, and
  * instead of the previous behaviour where the split-query guard saw
  * the replayed batch's own ids in the sink and refused FOREVER with
  * no correct remediation. The [[IdempotentSink]] marker still skips
  * fully-committed replays without re-running the probe. Read the
  * sink as `spark.read.parquet(s"$sink/batch-*")` (plain parquet
  * ignores nested non-partition directories).
  *
  * The driver-side index state — meta (corpus stats + k1/b +
  * tokenization pin) and the postings/dl readers — loads ONCE at
  * stream start ([[TextAnalysis.loadBm25Index]]); micro-batches call
  * the state-passing scorer, so a continuous serving stream pays zero
  * fixed per-batch index-side driver work. */
object StreamingBm25Score {

  /** Score `stream` (a streaming DataFrame of (queryIdCol, termCol)
    * query rows) against the BM25 index at `indexPath`, writing
    * (query_id, rank, doc_id, n_terms, score) rows to
    * `<sinkPath>/batch-<id>/` parquet directories. Returns after the
    * stream terminates (AvailableNow-style callers await inside). */
  def run(spark: SparkSession, stream: DataFrame, indexPath: String,
          queryIdCol: String, termCol: String, k: Int,
          sinkPath: String, checkpoint: String,
          maxDf: Long = Long.MaxValue,
          refuseSplitQueries: Boolean = true): Unit =
    runWithState(TextAnalysis.loadBm25Index(spark, indexPath), stream,
      queryIdCol, termCol, k, sinkPath, checkpoint, maxDf, refuseSplitQueries)

  /** [[run]] with the index state already loaded — callers sharing one
    * index across several streams load it once for all of them. */
  def runWithState(state: TextAnalysis.Bm25IndexState, stream: DataFrame,
                   queryIdCol: String, termCol: String, k: Int,
                   sinkPath: String, checkpoint: String,
                   maxDf: Long = Long.MaxValue,
                   refuseSplitQueries: Boolean = true): Unit = {
    import org.apache.spark.sql.functions.col
    val spark = stream.sparkSession
    // The split-query guard is EXACT with per-RUN amortized I/O
    // ([[BatchIdGuard]]): each committed batch leaves a tiny `_ids`
    // manifest beside its parquet, the run folds every manifest ONCE
    // into sorted primitive arrays (16 bytes per distinct id the sink
    // has ever served — a 10M-query sink history costs ~160 MB
    // driver, flat), and each batch then pays binary searches only.
    // Archiving old batch dirs on a retention cadence genuinely
    // bounds both the fold cost and the arrays: an archived batch is
    // simply no longer part of the guarded history. Pre-manifest
    // batch dirs self-heal; pre-batch-layout flat sinks refuse.
    val guard = new BatchIdGuard(spark, sinkPath, "query_id",
      (batchId, ids, batches) => s"StreamingBm25Score: batch $batchId " +
        s"presents query id(s) ${ids.mkString(", ")} first scored by " +
        s"batch(es) ${batches.mkString(", ")} " +
        "of this sink — a query split across micro-batches would " +
        "be scored once per fragment. (A batch replaying after a " +
        "crash is NOT this case: it re-presents its own ids and " +
        "converges by overwriting its own batch directory.) Stage " +
        "whole queries per file/message, or pass " +
        "refuseSplitQueries = false to accept per-fragment scoring")
    if (refuseSplitQueries) guard.refuseFlatLayout("StreamingBm25Score")
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the guard lives INSIDE the marker fence: a fully-committed
        // replayed batch skips the body entirely
        IdempotentSink.oncePerBatch(batch.sparkSession,
            s"$sinkPath/_batches", batchId) {
          val scored = TextAnalysis.scoreWithBm25StateMulti(state,
            batch.toDF(), queryIdCol, termCol, k, maxDf)
          val target = s"$sinkPath/batch-$batchId"
          if (refuseSplitQueries) {
            val ids = batch.toDF()
              .select(col(queryIdCol).cast("long")).distinct()
              .collect().map(_.getLong(0))
            // ids this batch itself served are a CRASH REPLAY (wrote,
            // crashed before the marker) — the overwrite below
            // converges them; only ids first served by a DIFFERENT
            // batch mean a query was split across micro-batches
            guard.check(batch.sparkSession, batchId, ids)
            scored.write.mode("overwrite").parquet(target)
            guard.commit(target, batchId, ids) // later batches guard in-memory
          } else scored.write.mode("overwrite").parquet(target)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
