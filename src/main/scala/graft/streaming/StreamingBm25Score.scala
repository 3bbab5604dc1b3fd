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
  * not just documented: the sink tracks the query ids it has already
  * scored (seeded from the existing sink at stream start, maintained
  * driver-side across batches), and a batch presenting an
  * already-scored id REFUSES loudly — a misconfigured stage that
  * fragments a query gets an error naming the ids, never a silent
  * once-per-fragment scoring. `refuseSplitQueries = false` opts out
  * for sources that legitimately re-serve ids (at the documented
  * per-fragment-scoring risk). Gated against the same DuckDB mirror
  * as the batch multi-query operator.
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
    // ids already in the sink, read ONCE at stream start (column-pruned
    // to query_id): a restarted stream keeps refusing ids it served in
    // a prior run. Per-batch additions are tracked driver-side — a
    // split query is a WITHIN-RUN hazard, caught without re-reading the
    // sink. A batch that appended but crashed before its marker is the
    // marker idiom's residual window; with the guard on, its replay now
    // refuses LOUDLY (the ids are in the sink) instead of duplicating.
    val seen = scala.collection.mutable.HashSet.empty[Long]
    if (refuseSplitQueries) {
      val p = new org.apache.hadoop.fs.Path(sinkPath)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(p))
        spark.read.parquet(sinkPath).select(col("query_id")).distinct()
          .collect().foreach(r => seen += r.getLong(0))
    }
    stream.writeStream
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        // the guard lives INSIDE the marker fence: a replayed committed
        // batch skips the body entirely and never false-refuses its own
        // (already-served) ids
        IdempotentSink.oncePerBatch(batch.sparkSession,
            s"$sinkPath/_batches", batchId) {
          val scored = TextAnalysis.scoreWithBm25StateMulti(state,
            batch.toDF(), queryIdCol, termCol, k, maxDf)
          if (refuseSplitQueries) {
            val ids = batch.toDF()
              .select(col(queryIdCol).cast("long")).distinct()
              .collect().map(_.getLong(0))
            val dup = ids.filter(seen).sorted
            if (dup.nonEmpty) throw new IllegalStateException(
              s"StreamingBm25Score: batch $batchId presents query id(s) " +
                s"${dup.take(8).mkString(", ")} already scored by this " +
                "sink — a query split across micro-batches would be " +
                "scored once per fragment; stage whole queries per " +
                "file/message (or pass refuseSplitQueries = false to " +
                "accept per-fragment scoring)")
            scored.write.mode("append").parquet(sinkPath)
            seen ++= ids
          } else scored.write.mode("append").parquet(sinkPath)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
