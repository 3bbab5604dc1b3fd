package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lifecycle operations for the persisted index family (BM25, IVF
  * float/SQ8/PQ) beyond build + append: COMPACTION (rewrite the
  * accumulated small files in place, bit-identical probes), DELETE
  * (GDPR takedowns / crawl refreshes — remove documents or vectors so
  * the index equals a build on the remaining corpus), and the
  * GUARDED-APPEND protocol (a resumable, marker-fenced batch append a
  * crashed-and-retried ingest job cannot double-count).
  *
  * Why these exist: every append — batch
  * ([[TextAnalysis.appendToBm25Index]],
  * [[Similarity.appendToIvfIndexSq8]]) or streaming
  * ([[graft.streaming.StreamingIvfAppend]]) — lands NEW files into the
  * live layout. At seconds-level streaming triggers that is small-files
  * debt (a probe lists and opens every file of its pruned partitions),
  * and for BM25 it also erodes the term-clustered row-group pruning
  * [[TextAnalysis.writeBm25Index]] establishes. The previously
  * documented remedy — a full rebuild — RE-FITS centroids/bounds/stats,
  * so probe results change across the maintenance window. Compaction
  * here rewrites bytes only: same rows, same meta, same centroids, same
  * codebook — probe ≡ pre-compaction bit-for-bit (spec-pinned), which
  * turns maintenance into a one-call, equivalence-gated operation.
  *
  * Durability model (same stance as the segment writer): directory
  * swaps are two renames — atomic on HDFS-like filesystems; a reader
  * PLANNING exactly between them sees a missing directory and fails
  * loudly (retryable), never wrong data. On object stores where rename
  * is copy+delete, run compaction/delete in a maintenance window or
  * against a path-versioned index root.
  */
object IndexMaintenance {

  /** files rewritten (before → after) by a compaction — `after` is
    * bounded by the partition/cluster count, independent of how many
    * appends accumulated. */
  final case class CompactStats(filesBefore: Long, filesAfter: Long)

  // ---- filesystem helpers -------------------------------------------

  private def hfs(spark: SparkSession, p: String): (FileSystem, Path) = {
    val path = new Path(p)
    (path.getFileSystem(spark.sparkContext.hadoopConfiguration), path)
  }

  /** Data files under `dir` (recursive), relative to it; `_`/`.`
    * names skipped at every level (markers, _SUCCESS, staging). */
  private[graft] def dataFiles(spark: SparkSession, dir: String): Seq[String] = {
    val (fs, root) = hfs(spark, dir)
    if (!fs.exists(root)) return Seq.empty
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(p: Path, rel: String): Unit =
      fs.listStatus(p).foreach { st =>
        val name = st.getPath.getName
        if (!name.startsWith("_") && !name.startsWith(".")) {
          val r = if (rel.isEmpty) name else s"$rel/$name"
          if (st.isDirectory) walk(st.getPath, r) else out += r
        }
      }
    walk(root, "")
    out.toSeq.sorted
  }

  private[graft] def dataFileCount(spark: SparkSession, dir: String): Long =
    dataFiles(spark, dir).size.toLong

  /** Swap `staged` into `live`: rename live aside, rename staged in,
    * drop the old bytes, refresh this session's listing caches. The
    * in-between window (live briefly absent) fails a concurrent
    * planner loudly — never silently serves half a directory. */
  private def swapDir(spark: SparkSession, live: String, staged: String): Unit = {
    val (fs, livePath) = hfs(spark, live)
    val stagedPath = new Path(staged)
    require(fs.exists(stagedPath), s"swapDir: staged dir $staged missing")
    val trash = new Path(live + "__old_" + java.util.UUID.randomUUID())
    if (fs.exists(livePath))
      require(fs.rename(livePath, trash), s"swapDir: could not move $live aside")
    require(fs.rename(stagedPath, livePath),
      s"swapDir: could not move $staged into place")
    fs.delete(trash, true)
    spark.catalog.refreshByPath(live)
  }

  private def deleteDir(spark: SparkSession, dir: String): Unit = {
    val (fs, p) = hfs(spark, dir)
    fs.delete(p, true)
  }

  private def stagingRoot(path: String): String =
    s"$path/_staging_${java.util.UUID.randomUUID()}"

  // ---- compaction ----------------------------------------------------

  /** COMPACT a persisted IVF index (float [[Similarity.writeIvfIndex]],
    * SQ8 [[Similarity.writeIvfIndexSq8]] or PQ
    * [[Similarity.writeIvfIndexPq]] — the `cells/` layout is shared):
    * rewrite each cell partition's accumulated append files into ONE
    * file per cell, WITHOUT re-fitting anything — centroids, bounds,
    * codebook and meta are untouched, and the rows themselves are
    * copied verbatim, so any probe is bit-identical before and after
    * (spec-pinned). This is the maintenance call the streamed-append
    * story needs: appends stay cheap (one pass over the increment),
    * and the accumulated small files fold back to the build-shaped
    * layout on whatever cadence operations chooses — unlike a rebuild,
    * which re-fits and therefore CHANGES probe results.
    *
    * Scale shape: one shuffle of the index rows keyed on `cell`
    * (`repartition(cell)` puts each cell wholly in one task, so the
    * partitioned write emits exactly one file per non-empty cell);
    * partition pruning on probes is unchanged (same directory names).
    */
  def compactIvfIndex(spark: SparkSession, path: String): CompactStats = {
    val cells = s"$path/cells"
    val before = dataFileCount(spark, cells)
    require(before > 0, s"compactIvfIndex: no index data under $cells")
    val staging = stagingRoot(path)
    try {
      spark.read.parquet(cells)
        .repartition(col("cell"))
        .write.partitionBy("cell").parquet(s"$staging/cells")
      swapDir(spark, cells, s"$staging/cells")
    } finally deleteDir(spark, staging)
    val after = dataFileCount(spark, cells)
    org.apache.log4j.Logger.getLogger(getClass)
      .info(s"compactIvfIndex($path): $before files -> $after")
    CompactStats(before, after)
  }

  /** COMPACT a persisted BM25 index ([[TextAnalysis.writeBm25Index]]
    * layout): re-cluster `postings/` on term (repartition +
    * sortWithinPartitions — restoring the row-group min/max pruning
    * that [[TextAnalysis.appendToBm25Index]]'s per-append files
    * erode) and fold `dl/` back to doc-clustered files. `meta/` is
    * untouched — corpus stats, k1/b and the tokenization pin are
    * exactly the merged index's, and the rows are copied verbatim, so
    * every probe scores bit-identically before and after
    * (spec-pinned). One postings-sized shuffle + one dl-sized shuffle;
    * nothing re-tokenizes. */
  def compactBm25Index(spark: SparkSession, path: String): CompactStats = {
    val postings = s"$path/postings"
    val dl = s"$path/dl"
    val before = dataFileCount(spark, postings) + dataFileCount(spark, dl)
    require(before > 0, s"compactBm25Index: no index data under $path")
    val staging = stagingRoot(path)
    try {
      spark.read.parquet(postings)
        .repartition(col("term")).sortWithinPartitions("term", "__doc")
        .write.parquet(s"$staging/postings")
      spark.read.parquet(dl)
        .repartition(col("__doc")).sortWithinPartitions("__doc")
        .write.parquet(s"$staging/dl")
      swapDir(spark, postings, s"$staging/postings")
      swapDir(spark, dl, s"$staging/dl")
    } finally deleteDir(spark, staging)
    val after = dataFileCount(spark, postings) + dataFileCount(spark, dl)
    org.apache.log4j.Logger.getLogger(getClass)
      .info(s"compactBm25Index($path): $before files -> $after")
    CompactStats(before, after)
  }

  // ---- delete ----------------------------------------------------------

  /** DELETE documents from a persisted BM25 index — the takedown /
    * crawl-refresh path [[TextAnalysis.appendToBm25Index]]'s refusal
    * message promises ("re-ingesting a changed document is a rebuild
    * (or a delete path), not an append"): after
    * `deleteFromBm25Index(ids)`, the index state equals
    * `writeBm25Index(corpus ∖ ids)` BIT-FOR-BIT (spec-pinned) —
    * postings and dl are the anti-joined rows (per-doc state is
    * per-doc), and the corpus stats are RECOMPUTED from the surviving
    * dl as exact integer sums. Recompute, not decrement, on purpose:
    * a decrement reads the deleted rows, so a delete that crashed
    * after the postings swap and RETRIED would find nothing to
    * decrement and leave meta stale forever — recompute converges to
    * the correct stats on any retry, making delete idempotent end to
    * end. Deleting an id not in the index is a no-op for it (takedown
    * semantics). Deleting EVERY document refuses loudly (an empty
    * index cannot score — drop it instead).
    *
    * Changed-document re-ingest composes: delete(ids) then
    * [[TextAnalysis.appendToBm25Index]] (or the guarded form) with
    * the new text ≡ a rebuild with the changed docs (spec-pinned).
    *
    * Cost: one postings-sized anti-join + rewrite (postings are
    * term-clustered, a doc's rows touch ~every file — the rewrite is
    * unavoidable for ANY doc-keyed delete in a term-keyed layout) and
    * one dl-sized rewrite; the CORPUS is never re-tokenized, which is
    * what distinguishes this from the rebuild. The rewrite re-clusters
    * on term, so a delete doubles as a compaction. */
  def deleteFromBm25Index(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    import spark.implicits._
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    val del = Materialize(ids.select(col(idCol).as("__doc")).distinct())
    val staging = stagingRoot(path)
    try {
      spark.read.parquet(s"$path/postings")
        .join(del, Seq("__doc"), "left_anti")
        .repartition(col("term")).sortWithinPartitions("term", "__doc")
        .write.parquet(s"$staging/postings")
      spark.read.parquet(s"$path/dl")
        .join(del, Seq("__doc"), "left_anti")
        .repartition(col("__doc")).sortWithinPartitions("__doc")
        .write.parquet(s"$staging/dl")
      // refuse BEFORE any swap: a delete that would empty the index
      // must leave it untouched, not half-swapped
      val st = spark.read.parquet(s"$staging/dl")
        .agg(sum(col("dl")).as("total_len"), count(lit(1)).as("n_docs"))
        .collect()(0)
      require(st.getLong(1) > 0,
        s"deleteFromBm25Index: deleting these ids empties the index at " +
          s"$path — an empty index cannot score; drop it instead")
      swapDir(spark, s"$path/postings", s"$staging/postings")
      swapDir(spark, s"$path/dl", s"$staging/dl")
      Seq((st.getLong(1), st.getLong(0),
          meta.getAs[Double]("k1"), meta.getAs[Double]("b"),
          meta.getAs[String]("tokenization")))
        .toDF("n_docs", "total_len", "k1", "b", "tokenization")
        .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
      spark.catalog.refreshByPath(s"$path/meta")
    } finally deleteDir(spark, staging)
  }

  /** DELETE vectors from a persisted IVF index (float/SQ8/PQ — the
    * shared `cells/` layout): after `deleteFromIvfIndex(ids)`, the
    * index equals a build on the remaining corpus under the SAME
    * centroids/bounds/codebook BIT-FOR-BIT (spec-pinned) — cell
    * assignment and codes are per-vector functions, so removing rows
    * removes exactly those vectors' contributions and nothing else.
    * Meta/centroids/codebook are untouched (delete never re-fits —
    * that is the rebuild's job on its own cadence). Idempotent:
    * deleting an absent id is a no-op, and a crashed-then-retried
    * delete converges (the anti-join finds nothing the second time).
    *
    * Scale shape: ONE column-pruned pass over (n_id, cell) finds the
    * touched cells (bounded collect — ≤ the cell count); only those
    * cell partitions are read again (partition-pruned scan),
    * anti-joined, rewritten and swapped — a delete of k vectors costs
    * the touched cells' bytes, never the corpus. A cell whose rows
    * all die is removed (probes of it simply match nothing). */
  def deleteFromIvfIndex(ids: DataFrame, idCol: String, path: String): Unit = {
    val spark = ids.sparkSession
    val cells = s"$path/cells"
    val del = Materialize(ids.select(col(idCol).cast("long").as("n_id")).distinct())
    val index = spark.read.parquet(cells)
    val touched = index.join(del, Seq("n_id"), "left_semi")
      .select(col("cell").cast("long")).distinct()
      .collect().map(_.getLong(0)).sorted.toSeq
    if (touched.isEmpty) return // nothing to delete — no-op
    val staging = stagingRoot(path)
    try {
      val kept = index.filter(col("cell").isin(touched: _*))
        .join(del, Seq("n_id"), "left_anti")
      kept.repartition(col("cell"))
        .write.partitionBy("cell").parquet(s"$staging/cells")
      for (c <- touched) {
        val stagedCell = s"$staging/cells/cell=$c"
        val liveCell = s"$cells/cell=$c"
        val (fs, stagedPath) = hfs(spark, stagedCell)
        if (fs.exists(stagedPath)) swapDir(spark, liveCell, stagedCell)
        else deleteDir(spark, liveCell) // every row of the cell died
      }
      spark.catalog.refreshByPath(cells)
    } finally deleteDir(spark, staging)
  }

  /** DELETE reference documents from a persisted MinHash index
    * ([[Dedup.writeMinhashIndex]] layout) — the takedown path for the
    * third index family: after `deleteFromMinhashIndex(ids)`, probes
    * can never surface a deleted document as a near-dup witness. The
    * deleted ids leave BOTH sides of the layout: `shingles/` by
    * anti-join (the verify stage can't read their shingle sets) and
    * `bands/` by exploding each bucket's id list, anti-joining, and
    * regrouping (emptied buckets disappear; surviving lists are
    * subsets of capped lists, so the build-time `maxBucketSize` bound
    * still holds). Meta (the banding pins) is untouched.
    *
    * Equivalence, with one honest caveat: probe(delete ∘ build(ref))
    * ≡ probe(build(ref ∖ ids)) as a row SET (spec-pinned) — EXCEPT
    * for buckets the BUILD's skew cap dropped entirely: a capped-away
    * bucket stays gone after a delete even if the remainder would now
    * fit under the cap (resurrecting it would need the dropped ids,
    * which the index no longer holds). That is a recall-only
    * difference in exactly the degenerate-bucket regime the cap
    * already documents as dropped; rebuild on the remainder to
    * recover it. Idempotent: absent ids are no-ops. Deleting every
    * reference document refuses loudly (an empty index cannot load —
    * drop it instead).
    *
    * Cost: one shingles-sized anti-join + one bands-sized
    * explode/regroup (the index, never the reference corpus — nothing
    * re-shingles); both rewrites staged and swapped like the other
    * deletes. */
  def deleteFromMinhashIndex(ids: DataFrame, idCol: String,
                             path: String): Unit = {
    val spark = ids.sparkSession
    val del = Materialize(ids.select(col(idCol).cast("long").as("id")).distinct())
    val staging = stagingRoot(path)
    try {
      val keptShingles = spark.read.parquet(s"$path/shingles")
        .join(del, Seq("id"), "left_anti")
      keptShingles.repartition(col("id"))
        .write.parquet(s"$staging/shingles")
      // refuse BEFORE any swap — an emptied index cannot load
      require(spark.read.parquet(s"$staging/shingles").limit(1).count() > 0,
        s"deleteFromMinhashIndex: deleting these ids empties the index at " +
          s"$path — drop it instead")
      spark.read.parquet(s"$path/bands")
        .select(col("bucket"), explode(col("ids")).as("id"))
        .join(del, Seq("id"), "left_anti")
        .groupBy(col("bucket")).agg(collect_list(col("id")).as("ids"))
        .write.parquet(s"$staging/bands")
      swapDir(spark, s"$path/shingles", s"$staging/shingles")
      swapDir(spark, s"$path/bands", s"$staging/bands")
    } finally deleteDir(spark, staging)
  }

  // ---- guarded (resumable, exactly-once) batch append -------------------

  /** The marker-fenced BATCH append protocol — the
    * [[graft.streaming.IdempotentSink]] discipline for batch ingest
    * jobs, closing the crash window the plain appends document (a
    * retry after a crash mid-append double-counts the increment).
    * Stronger than the streaming marker (which retains a residual
    * window): every phase here is individually resumable, so a retry
    * with the same `appendId` converges to exactly-once from ANY
    * crash point.
    *
    * Protocol, under `<path>/_appends/<appendId>/` (underscore-
    * prefixed — readers of the index never see it):
    *
    *   1. STAGE — `stage(stageDir)` writes the increment's files
    *      under the staging dir (and runs the append's validations:
    *      overlap, bounds, tokenization). Fenced by a `_STAGED`
    *      marker written after; a crash mid-stage restages from
    *      scratch (nothing has touched the live index yet).
    *   2. MOVE — each staged data file RENAMES into the live layout
    *      at its relative path, name-prefixed with the appendId.
    *      Renames are atomic per file and the names are deterministic
    *      (fixed once `_STAGED` exists), so a crashed move resumes by
    *      moving the files still in staging — an already-moved file
    *      cannot move twice.
    *   3. FINALIZE — `finalize()` runs IDEMPOTENT post-work (e.g.
    *      recomputing BM25 meta stats from the live dl — exact
    *      integer sums that converge on any retry).
    *   4. COMMIT — the `_COMMITTED` marker; any later call with this
    *      appendId is a no-op (returns false).
    *
    * Caller contract: one appendId names ONE logical increment,
    * forever (replays must present the same rows — the foreachBatch
    * determinism rule, batch-shaped); concurrent appends use distinct
    * ids. Returns true iff this call performed (or completed) the
    * append. */
  private[graft] def runGuardedAppend(
      spark: SparkSession, path: String, appendId: String)(
      stage: String => Unit)(finalize: () => Unit): Boolean = {
    require(appendId.nonEmpty && appendId.forall(c =>
        c.isLetterOrDigit || c == '-' || c == '_' || c == '.'),
      s"appendId '$appendId' must be a [A-Za-z0-9._-]+ token — it becomes " +
        "a marker directory and a file-name prefix")
    val guardDir = s"$path/_appends/$appendId"
    val (fs, _) = hfs(spark, guardDir)
    if (fs.exists(new Path(s"$guardDir/_COMMITTED"))) return false
    val stageDir = s"$guardDir/stage"
    val stagedFlag = new Path(s"$guardDir/_STAGED")
    if (!fs.exists(stagedFlag)) {
      deleteDir(spark, stageDir) // partial staging from a crash mid-stage
      stage(stageDir)
      fs.create(stagedFlag, true).close()
    }
    for (rel <- dataFiles(spark, stageDir)) {
      val src = new Path(s"$stageDir/$rel")
      val slash = rel.lastIndexOf('/')
      val targetRel =
        if (slash < 0) s"${appendId}_$rel"
        else s"${rel.substring(0, slash)}/${appendId}_${rel.substring(slash + 1)}"
      val target = new Path(s"$path/$targetRel")
      if (fs.exists(target))
        // rename is atomic: moved means gone from staging. Both
        // existing means the id was reused for different data —
        // refuse rather than guess
        throw new IllegalStateException(
          s"guarded append '$appendId' at $path: $target already exists " +
            s"while $src is still staged — the appendId was reused for a " +
            "different increment; appendIds name one logical increment")
      fs.mkdirs(target.getParent)
      require(fs.rename(src, target),
        s"guarded append '$appendId': could not move $src -> $target")
    }
    finalize()
    fs.create(new Path(s"$guardDir/_COMMITTED"), true).close()
    true
  }
}
