package graft.sources

import java.nio.charset.StandardCharsets
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Segment descriptors + versioned-interval timeline resolution.
  *
  * The reference gets its segment list from the Druid overlord and
  * resolves a `VersionedIntervalTimeline` — latest version wins per
  * overlapping time chunk, shard chunks unioned
  * (druid-mr/DruidInputFormat.java:100-115). Here the overlord HTTP
  * round-trip is replaced by a filesystem JSON catalog (a Spark cluster
  * needs no coordinator), but the timeline semantics are identical:
  * re-ingesting an interval under a newer version atomically
  * overshadows the old data, including *partial* overshadowing where a
  * newer segment covers only part of an older one.
  */
final case class SegmentDescriptor(
    dataSource: String,
    startMs: Long,
    endMs: Long,
    version: String,
    shardNum: Int,
    numShards: Int,
    path: String)

/** A descriptor clipped to the window the timeline grants it
  * (≙ Druid WindowedDataSegment, DruidInputFormat.java:110-114). */
final case class WindowedSegment(segment: SegmentDescriptor, windowStartMs: Long, windowEndMs: Long)

object VersionedTimeline {

  /** Resolve which (segment, window) pairs are visible for a query
    * interval: per elementary sub-interval, the lexicographically
    * greatest version covering it wins; all shards of that version are
    * included; contiguous windows of the same segment are merged.
    */
  def resolve(segments: Seq[SegmentDescriptor], queryStartMs: Long, queryEndMs: Long): Seq[WindowedSegment] = {
    val candidates = segments.filter(s => s.startMs < queryEndMs && s.endMs > queryStartMs)
    if (candidates.isEmpty) return Nil

    // elementary intervals between all clipped boundary points
    val bounds = candidates.flatMap(s => Seq(s.startMs.max(queryStartMs), s.endMs.min(queryEndMs)))
      .distinct.sorted
    val elementary = bounds.zip(bounds.tail)

    val picked: Seq[(SegmentDescriptor, Long, Long)] = elementary.flatMap { case (lo, hi) =>
      val covering = candidates.filter(s => s.startMs <= lo && s.endMs >= hi)
      if (covering.isEmpty) Nil
      else {
        val winner = covering.map(_.version).max // latest version wins
        covering.filter(_.version == winner).map(s => (s, lo, hi))
      }
    }

    // merge contiguous windows of the same segment
    picked.groupBy(_._1).toSeq.flatMap { case (seg, windows) =>
      val sorted = windows.map(w => (w._2, w._3)).sortBy(_._1)
      sorted.foldLeft(List.empty[(Long, Long)]) {
        case ((s, e) :: rest, (lo, hi)) if lo == e => (s, hi) :: rest
        case (acc, w) => w :: acc
      }.reverse.map { case (lo, hi) => WindowedSegment(seg, lo, hi) }
    }.sortBy(w => (w.windowStartMs, w.segment.version, w.segment.shardNum))
  }
}

/** Filesystem JSON catalog: one `catalog.json` per datasource dir.
  * Single-writer per datasource (the overlord's role in Druid);
  * readers see an atomic snapshot via rename-on-publish.
  *
  * All IO goes through the Hadoop FileSystem API resolved from the
  * base path's scheme + the active session's Hadoop configuration, so
  * the store runs unchanged on local disk, HDFS, or any object store
  * with a Hadoop connector (s3a, gs, abfs). Rename is atomic on local
  * and HDFS; on object stores where rename is copy+delete the
  * single-writer assumption still makes publishes safe, and readers
  * retry once on the (tiny) not-found window. */
object SegmentCatalog {

  def catalogPath(base: String, dataSource: String): String =
    s"$base/$dataSource/catalog.json"

  private[sources] def fsFor(path: HPath): FileSystem = {
    val conf = SparkSession.getActiveSession
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())
    path.getFileSystem(conf)
  }

  def read(base: String, dataSource: String): Seq[SegmentDescriptor] = {
    val p = new HPath(catalogPath(base, dataSource))
    val fs = fsFor(p)
    def attempt(): Option[String] = {
      if (!fs.exists(p)) None
      else {
        val in = fs.open(p)
        try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in),
          StandardCharsets.UTF_8))
        finally in.close()
      }
    }
    // Publish is write-tmp → delete-target → rename-tmp-to-target, so
    // a reader can land in the window where the target is briefly
    // absent. In exactly that window (and only there) the publisher's
    // .tmp is present — on copy+delete object stores the new target
    // object appears before the tmp is deleted. So: target missing AND
    // tmp present → publisher mid-rename, retry with backoff (object
    // stores can take seconds); target missing AND no tmp → ONE final
    // re-read before concluding the catalog doesn't exist: the rename
    // can complete (target appears, tmp gone) between attempt() and
    // the tmp probe, and giving up there would hand a concurrent
    // publisher an empty merge base — silent segment loss. A cold
    // store pays one extra metadata call, never a sleep.
    def publishInFlight(): Boolean =
      try fs.exists(new HPath(p.toString + ".tmp")) catch { case _: Exception => false }
    @annotation.tailrec
    def retry(attemptsLeft: Int, delayMs: Long): Option[String] =
      attempt() match {
        case some @ Some(_) => some
        case None if attemptsLeft > 0 && publishInFlight() =>
          Thread.sleep(delayMs)
          retry(attemptsLeft - 1, math.min(delayMs * 2, 1000))
        case None => attempt()
      }
    val content = retry(attemptsLeft = 6, delayMs = 50)
    content match {
      case None => Nil
      case Some(text) => JsonMethods.parse(text) match {
        case JArray(xs) => xs.collect { case o: JObject =>
          implicit val fmts: Formats = DefaultFormats
          o.extract[SegmentDescriptor]
        }
        case _ => Nil
      }
    }
  }

  /** Serialize catalog writers per datasource with an exclusive lock
    * file (`catalog.lock`, created with overwrite=false — atomic on
    * local FS and HDFS; object stores without atomic create keep the
    * documented single-writer-per-datasource deployment rule, the role
    * Druid gives the overlord's transactional metadata store). Without
    * this, a vacuum racing a publish is a lost-update: both
    * read-modify-write the same file, so the later rename either
    * resurrects killed descriptors (pointing at deleted files) or
    * drops the just-published ones. A crashed writer's stale lock is
    * broken after `staleMs`. */
  private def withWriteLock[T](base: String, dataSource: String)(body: => T): T = {
    val lock = new HPath(s"$base/$dataSource/catalog.lock")
    val fs = fsFor(lock)
    fs.mkdirs(lock.getParent)
    val timeoutMs = 30000L
    val staleMs = 60000L
    val deadline = System.currentTimeMillis() + timeoutMs
    var acquired = false
    while (!acquired) {
      try {
        val out = fs.create(lock, false) // create-exclusive
        try out.write(
          s"${java.lang.management.ManagementFactory.getRuntimeMXBean.getName}"
            .getBytes(StandardCharsets.UTF_8))
        finally out.close()
        acquired = true
      } catch {
        case _: java.io.IOException =>
          val mtime =
            try Some(fs.getFileStatus(lock).getModificationTime)
            catch { case _: Exception => None }
          mtime match {
            case Some(t) if System.currentTimeMillis() - t > staleMs =>
              fs.delete(lock, false) // crashed holder; next loop re-races create
            case _ if System.currentTimeMillis() > deadline =>
              throw new java.io.IOException(
                s"timed out acquiring catalog lock $lock after ${timeoutMs}ms")
            case _ => Thread.sleep(100)
          }
      }
    }
    try body finally fs.delete(lock, false)
  }

  /** Locked read-modify-write of the full descriptor list: every
    * catalog mutation (publish, vacuum) goes through here so
    * concurrent writers serialize instead of losing updates.
    * Skips the write when `f` is an identity on the current content.
    * @return (before, after) descriptor lists */
  def mutate(base: String, dataSource: String)(
      f: Seq[SegmentDescriptor] => Seq[SegmentDescriptor])
      : (Seq[SegmentDescriptor], Seq[SegmentDescriptor]) =
    withWriteLock(base, dataSource) {
      val before = read(base, dataSource)
      val after = f(before)
      if (after != before) replace(base, dataSource, after)
      (before, after)
    }

  /** Append descriptors and publish atomically (write temp + rename,
    * under the per-datasource write lock). Idempotent per
    * (version, chunk, shard): re-publishing the same segment identity
    * REPLACES its descriptor instead of appending a duplicate — a
    * retried ingest must not double-count at scan time. */
  def publish(base: String, dataSource: String, newSegments: Seq[SegmentDescriptor]): Unit = {
    def key(s: SegmentDescriptor) = (s.version, s.startMs, s.shardNum)
    val newKeys = newSegments.map(key).toSet
    mutate(base, dataSource) { all =>
      all.filterNot(s => newKeys.contains(key(s))) ++ newSegments
    }
    ()
  }

  /** Overwrite the catalog with exactly `all` (vacuum's path — publish
    * merges; this replaces). Same atomic write-tmp-rename publish. */
  private[sources] def replace(base: String, dataSource: String,
                               all: Seq[SegmentDescriptor]): Unit = {
    val json = JArray(all.map(s => JObject(
      "dataSource" -> JString(s.dataSource),
      "startMs" -> JLong(s.startMs),
      "endMs" -> JLong(s.endMs),
      "version" -> JString(s.version),
      "shardNum" -> JInt(s.shardNum),
      "numShards" -> JInt(s.numShards),
      "path" -> JString(s.path))).toList)
    val target = new HPath(catalogPath(base, dataSource))
    val fs = fsFor(target)
    fs.mkdirs(target.getParent)
    val tmp = new HPath(target.toString + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(JsonMethods.compact(JsonMethods.render(json))
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    // delete-then-rename: FileSystem.rename refuses existing targets on
    // several stores; single-writer + reader retry covers the gap
    if (fs.exists(target)) fs.delete(target, false)
    if (!fs.rename(tmp, target))
      throw new java.io.IOException(s"catalog publish rename failed: $tmp -> $target")
  }
}
