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
    import org.apache.hadoop.fs.Path
    val spark = stream.sparkSession
    val sinkP = new Path(sinkPath)
    val fs = sinkP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    // The split-query guard is EXACT with per-RUN amortized I/O: each
    // committed batch leaves a tiny `_ids` manifest beside its
    // parquet (one id per line), and the run folds every manifest
    // ONCE into a pair of sorted primitive arrays (id → first-serving
    // batch, 16 bytes per distinct id the sink has ever served — a
    // 10M-query sink history costs ~160 MB driver, flat, not the
    // boxed-map multiples the pre-manifest seed paid, and each batch
    // then pays binary searches plus manifest reads only for batches
    // committed since the last one (normally zero — its own writes
    // fold in-memory). Archiving old batch dirs on a retention
    // cadence genuinely bounds both the fold cost and the arrays: an
    // archived batch is simply no longer part of the guarded history.
    // Batch dirs from the pre-manifest layout self-heal: their
    // manifest derives once from their own parquet (column-pruned)
    // and persists.
    if (refuseSplitQueries && fs.exists(sinkP)) {
      // a sink written by the pre-batch-directory layout (flat part
      // files in the root) cannot resume: the guard can't attribute
      // flat rows to a batch, and `batch-*` reads would silently skip
      // them. Refuse loudly instead of forgetting the served history.
      val flat = fs.listStatus(sinkP).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      if (flat.nonEmpty) throw new IllegalStateException(
        s"StreamingBm25Score: sink $sinkPath holds ${flat.length} flat data " +
          "file(s) from the pre-batch-directory layout — the split-query " +
          "guard cannot attribute them to a batch and batch-* reads would " +
          "not see them. Resuming requires a fresh sink + checkpoint; " +
          "migrate the old rows by reading the flat files explicitly.")
    }
    def committedBatches(): Seq[(Long, Path)] =
      if (!fs.exists(sinkP)) Seq.empty
      else fs.listStatus(sinkP).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
        .flatMap(st => scala.util.Try(
          st.getPath.getName.stripPrefix("batch-").toLong).toOption
          .map(_ -> st.getPath))
    def writeIdsManifest(dir: Path, ids: Array[Long]): Unit = {
      val out = fs.create(new Path(dir, "_ids"), true)
      try out.write(ids.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
      finally out.close()
    }
    def batchIds(spark: SparkSession, dir: Path): Array[Long] = {
      val mf = new Path(dir, "_ids")
      if (!fs.exists(mf)) // pre-manifest batch dir: derive + persist once
        writeIdsManifest(dir, spark.read.parquet(dir.toString)
          .select(col("query_id").cast("long")).distinct()
          .collect().map(_.getLong(0)))
      val in = fs.open(mf)
      val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
                 finally in.close()
      text.linesIterator.filter(_.nonEmpty).map(_.toLong).toArray
    }
    // per-run guard state: sorted ids with their first-serving batch,
    // plus which batch manifests are already folded in
    var guardIds = Array.emptyLongArray
    var guardFirst = Array.emptyLongArray
    val folded = scala.collection.mutable.Set.empty[Long]
    def foldBatch(b: Long, ids: Array[Long]): Unit = {
      val sorted = ids.sorted
      val mi = new Array[Long](guardIds.length + sorted.length)
      val mf = new Array[Long](mi.length)
      var i = 0; var j = 0; var o = 0
      while (i < guardIds.length || j < sorted.length) {
        val takeOld = j >= sorted.length ||
          (i < guardIds.length && guardIds(i) <= sorted(j))
        if (takeOld) {
          mi(o) = guardIds(i); mf(o) = guardFirst(i); o += 1
          i += 1
        } else {
          // ties take the old side first, so an id in several
          // manifests keeps its FIRST-serving batch (manifests fold
          // in ascending batch order) and the duplicate drops here
          if (!(o > 0 && mi(o - 1) == sorted(j))) {
            mi(o) = sorted(j); mf(o) = b; o += 1
          }
          j += 1
        }
      }
      guardIds = java.util.Arrays.copyOf(mi, o)
      guardFirst = java.util.Arrays.copyOf(mf, o)
      folded += b
    }
    def firstServedBy(id: Long): Option[Long] = {
      val i = java.util.Arrays.binarySearch(guardIds, id)
      if (i >= 0) Some(guardFirst(i)) else None
    }
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
            // fold manifests committed since the last look (ascending,
            // so first-serving attribution is exact); normally zero —
            // the whole history folds once, on the run's first batch
            for ((b, dir) <- committedBatches().sortBy(_._1)
                 if b != batchId && !folded.contains(b))
              foldBatch(b, batchIds(batch.sparkSession, dir))
            // ids this batch itself served are a CRASH REPLAY (wrote,
            // crashed before the marker) — the overwrite below
            // converges them; only ids first served by a DIFFERENT
            // batch mean a query was split across micro-batches
            val conflicts = scala.collection.immutable.SortedMap.empty[Long, Long] ++
              ids.flatMap(id => firstServedBy(id)
                .filter(_ != batchId).map(id -> _))
            if (conflicts.nonEmpty) throw new IllegalStateException(
              s"StreamingBm25Score: batch $batchId presents query id(s) " +
                s"${conflicts.keys.take(8).mkString(", ")} first scored by " +
                s"batch(es) ${conflicts.values.take(8).toSeq.distinct.mkString(", ")} " +
                "of this sink — a query split across micro-batches would " +
                "be scored once per fragment. (A batch replaying after a " +
                "crash is NOT this case: it re-presents its own ids and " +
                "converges by overwriting its own batch directory.) Stage " +
                "whole queries per file/message, or pass " +
                "refuseSplitQueries = false to accept per-fragment scoring")
            scored.write.mode("overwrite").parquet(target)
            writeIdsManifest(new Path(target), ids)
            foldBatch(batchId, ids) // later batches guard in-memory
          } else scored.write.mode("overwrite").parquet(target)
        }
        ()
      }
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start().awaitTermination()
  }
}
