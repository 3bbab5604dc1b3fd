package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** The per-sink first-serving-batch guard shared by the streaming
  * SERVING sinks ([[StreamingBm25Score]], [[StreamingHybridServe]]):
  * exact detection of an id served by two different micro-batches,
  * with per-RUN amortized I/O.
  *
  * Mechanism (unchanged from its first home in StreamingBm25Score):
  * every committed batch leaves a small `_ids` manifest beside its
  * parquet (one id per line); a run folds each manifest ONCE into a
  * pair of sorted primitive arrays (id → first-serving batch, 16
  * bytes per distinct id the sink has ever served — flat, archiving
  * old batch dirs bounds both the arrays and the fold), and each
  * batch then pays binary searches plus manifest reads only for
  * batches committed since its last look (normally zero — its own
  * writes fold in-memory). Batch dirs from the pre-manifest layout
  * SELF-HEAL: their manifest derives once from their own parquet
  * (column-pruned) and persists. A batch re-presenting ids FIRST
  * SERVED BY ITSELF is a crash replay and passes (the deterministic
  * `batch-<id>/` overwrite converges it); ids first served by a
  * DIFFERENT batch refuse loudly with the caller's message.
  *
  * What "an id in two batches" MEANS is the caller's semantics — a
  * query fragmented across term-row micro-batches for
  * StreamingBm25Score, a whole-row query id re-served for
  * StreamingHybridServe — so the refusal text is caller-supplied
  * ([[conflictMessage]]). */
private[streaming] final class BatchIdGuard(
    spark: SparkSession, sinkPath: String, idColName: String,
    conflictMessage: (Long, Seq[Long], Seq[Long]) => String) {

  private val sinkP = new Path(sinkPath)
  private val fs: FileSystem =
    sinkP.getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Refuse a sink written by the pre-batch-directory layout (flat
    * part files in the root): the guard cannot attribute flat rows to
    * a batch, and `batch-*` reads would silently skip them — resuming
    * such a sink silently FORGETS its served history. Called once at
    * stream start by guarded runs. */
  def refuseFlatLayout(opName: String): Unit =
    if (fs.exists(sinkP)) {
      val flat = fs.listStatus(sinkP).filter(st => st.isFile &&
        !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith("."))
      if (flat.nonEmpty) throw new IllegalStateException(
        s"$opName: sink $sinkPath holds ${flat.length} flat data " +
          "file(s) from the pre-batch-directory layout — the guard " +
          "cannot attribute them to a batch and batch-* reads would " +
          "not see them. Resuming requires a fresh sink + checkpoint; " +
          "migrate the old rows by reading the flat files explicitly.")
    }

  private def committedBatches(): Seq[(Long, Path)] =
    if (!fs.exists(sinkP)) Seq.empty
    else fs.listStatus(sinkP).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("batch-"))
      .flatMap(st => scala.util.Try(
        st.getPath.getName.stripPrefix("batch-").toLong).toOption
        .map(_ -> st.getPath))

  private def writeIdsManifest(dir: Path, ids: Array[Long]): Unit = {
    val out = fs.create(new Path(dir, "_ids"), true)
    try out.write(ids.sorted.mkString("", "\n", "\n").getBytes("UTF-8"))
    finally out.close()
  }

  private def batchIds(spark: SparkSession, dir: Path): Array[Long] = {
    val mf = new Path(dir, "_ids")
    if (!fs.exists(mf)) // pre-manifest batch dir: derive + persist once
      writeIdsManifest(dir, spark.read.parquet(dir.toString)
        .select(col(idColName).cast("long")).distinct()
        .collect().map(_.getLong(0)))
    val in = fs.open(mf)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    text.linesIterator.filter(_.nonEmpty).map(_.toLong).toArray
  }

  // per-run guard state: sorted ids with their first-serving batch,
  // plus which batch manifests are already folded in
  private var guardIds = Array.emptyLongArray
  private var guardFirst = Array.emptyLongArray
  private val folded = scala.collection.mutable.Set.empty[Long]

  private def foldBatch(b: Long, ids: Array[Long]): Unit = {
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

  private def firstServedBy(id: Long): Option[Long] = {
    val i = java.util.Arrays.binarySearch(guardIds, id)
    if (i >= 0) Some(guardFirst(i)) else None
  }

  /** Fold any batch manifests committed since the last look and throw
    * the caller's refusal iff any of `ids` was first served by a
    * batch other than `batchId`. Call BEFORE writing the batch. */
  def check(spark: SparkSession, batchId: Long, ids: Array[Long]): Unit = {
    // fold manifests committed since the last look (ascending, so
    // first-serving attribution is exact); normally zero — the whole
    // history folds once, on the run's first batch
    for ((b, dir) <- committedBatches().sortBy(_._1)
         if b != batchId && !folded.contains(b))
      foldBatch(b, batchIds(spark, dir))
    val conflicts = scala.collection.immutable.SortedMap.empty[Long, Long] ++
      ids.flatMap(id => firstServedBy(id)
        .filter(_ != batchId).map(id -> _))
    if (conflicts.nonEmpty) throw new IllegalStateException(
      conflictMessage(batchId, conflicts.keys.take(8).toSeq,
        conflicts.values.take(8).toSeq.distinct))
  }

  /** Persist the committed batch's `_ids` manifest beside its parquet
    * and fold it in-memory (later batches of this run guard without
    * re-reading it). Call AFTER the batch's parquet landed. */
  def commit(targetDir: String, batchId: Long, ids: Array[Long]): Unit = {
    writeIdsManifest(new Path(targetDir), ids)
    foldBatch(batchId, ids)
  }
}
