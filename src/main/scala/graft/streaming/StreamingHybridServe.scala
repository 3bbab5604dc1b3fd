package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions.{col, explode}

import graft.operators.{Retrieval, Similarity}

/** STREAMING hybrid retrieval serving — the full certified serving
  * composition ([[graft.operators.Retrieval.hybridServe]]: persisted
  * BM25 top-kLex ⊕ persisted-PQ nominate → exact-cosine re-rank
  * top-kAnn, RRF-fused per query) applied to a continuous QUERY
  * stream. With [[StreamingIndexIngest]] writing the same indexes
  * from the crawl stream and the maintenance policies tending them
  * mid-stream, this closes the production loop: ingest → tend →
  * serve, all three stages streaming, all three reading/writing only
  * persisted indexes.
  *
  * Stream shape: ONE ROW PER QUERY — (`idCol`, `termsCol`:
  * array&lt;string&gt;, `vecCol`: array&lt;float|double&gt;). A
  * query's lexical terms and its embedding travel together in one
  * row, so the split-query hazard [[StreamingBm25Score]] must guard
  * against (a query's term ROWS fragmenting across micro-batches)
  * cannot arise — micro-batches are row-atomic. Per batch the terms
  * explode to the (query_id, term) rows the BM25 scorer takes and
  * the embedding side runs through [[Similarity.prepareQueries]];
  * both index states are loaded ONCE at stream start
  * ([[Retrieval.loadHybridState]]), so a continuous serving stream
  * pays zero fixed per-batch index-side driver work.
  *
  * Batch independence: both indexes are FIXED for the run and every
  * stage of the composition is per-query (each query's fused top-K
  * depends only on its own terms + embedding), so the stream output
  * over any batching of a query set equals the batch
  * [[Retrieval.hybridServe]] over the same set (spec-pinned for 1-,
  * 2- and 3-batch splits).
  *
  * Sink + delivery: [[StreamingBm25Score]]'s layout, unchanged —
  * each micro-batch OVERWRITES its own deterministic
  * `<sink>/batch-<batchId>/` parquet directory (a batch that wrote
  * but crashed before its marker converges on replay), the
  * [[IdempotentSink]] marker skips fully-committed replays, and the
  * sink reads back as `spark.read.parquet(s"$sink/batch-*")`.
  *
  * Re-served ids: the [[BatchIdGuard]] manifest mechanism refuses a
  * query id FIRST SERVED BY A DIFFERENT BATCH of this sink — here
  * that means the source re-emitted an id (two different queries
  * sharing an id would fuse into one garbled union read; the same
  * query re-asked would silently duplicate its rows in a `batch-*`
  * union). Serving tiers that legitimately re-serve ids (answers are
  * per-batch, the union read is not their contract) pass
  * `refuseReservedIds = false`. A crash-replayed batch re-presents
  * its OWN ids and converges — never refused. */
object StreamingHybridServe {

  /** Serve `stream` (one (idCol, termsCol, vecCol) row per query)
    * against the two persisted indexes, writing fused
    * (query_id, fused_rank, doc_id, n_lists, rrf_score) rows to
    * `<sinkPath>/batch-<id>/`. AvailableNow trigger; returns after
    * the stream terminates. */
  def run(spark: SparkSession, stream: DataFrame,
          bm25IndexPath: String, pqIndexPath: String,
          idCol: String, termsCol: String, vecCol: String,
          corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
          sinkPath: String, checkpoint: String,
          kLex: Int = 30, kNominate: Int = 30, kAnn: Int = 10,
          nprobe: Int = 4, rrfK: Int = 60, topK: Int = 10,
          refuseReservedIds: Boolean = true): Unit =
    runWithState(Retrieval.loadHybridState(spark, bm25IndexPath, pqIndexPath),
      stream, idCol, termsCol, vecCol, corpus, corpusIdCol, corpusVecCol,
      sinkPath, checkpoint, kLex, kNominate, kAnn, nprobe, rrfK, topK,
      refuseReservedIds)

  /** [[run]] with both index states already loaded — callers sharing
    * the indexes across several streams load them once for all. */
  def runWithState(state: Retrieval.HybridServeState, stream: DataFrame,
                   idCol: String, termsCol: String, vecCol: String,
                   corpus: DataFrame, corpusIdCol: String, corpusVecCol: String,
                   sinkPath: String, checkpoint: String,
                   kLex: Int = 30, kNominate: Int = 30, kAnn: Int = 10,
                   nprobe: Int = 4, rrfK: Int = 60, topK: Int = 10,
                   refuseReservedIds: Boolean = true): Unit = {
    val spark = stream.sparkSession
    val guard = new BatchIdGuard(spark, sinkPath, "query_id",
      (batchId, ids, batches) => s"StreamingHybridServe: batch $batchId " +
        s"presents query id(s) ${ids.mkString(", ")} first served by " +
        s"batch(es) ${batches.mkString(", ")} of this sink — a re-served " +
        "id would duplicate (or, under a different payload, garble) that " +
        "query's rows in a batch-* union read. (A batch replaying after " +
        "a crash is NOT this case: it re-presents its own ids and " +
        "converges by overwriting its own batch directory.) Serve each " +
        "query id once per sink, or pass refuseReservedIds = false if " +
        "answers are consumed per-batch")
    if (refuseReservedIds) guard.refuseFlatLayout("StreamingHybridServe")
    stream.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        // guard + serve live INSIDE the marker fence: a fully-
        // committed replayed batch skips the body entirely
        IdempotentSink.oncePerBatch(batch.sparkSession,
            s"$sinkPath/_batches", batchId) {
          val b = batch.toDF()
          val queryTerms = b.select(col(idCol).as("query_id"),
            explode(col(termsCol)).as("term"))
          val queryVecs = Similarity.prepareQueries(b, idCol, vecCol)
          val fused = Retrieval.hybridServeWith(state,
            queryTerms, "query_id", "term", queryVecs,
            corpus, corpusIdCol, corpusVecCol,
            kLex, kNominate, kAnn, nprobe, rrfK, topK)
          val target = s"$sinkPath/batch-$batchId"
          if (refuseReservedIds) {
            val ids = b.select(col(idCol).cast("long")).distinct()
              .collect().map(_.getLong(0))
            guard.check(b.sparkSession, batchId, ids)
            fused.write.mode("overwrite").parquet(target)
            guard.commit(target, batchId, ids)
          } else fused.write.mode("overwrite").parquet(target)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
