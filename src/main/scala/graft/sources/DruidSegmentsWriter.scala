package graft.sources

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.collection.mutable

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** Distributed WRITE path of the `druid-segments` DataSource V2 table:
  * a DataFrame becomes real Apache Druid v9 binary segments on deep
  * storage — the inverse of the reference's read-only entry point
  * (druid-mr/DruidInputFormat.java reads segments; publishing still
  * required a full Druid indexing service, which this replaces for
  * Spark-resident data):
  *
  * {{{
  * df.select($"__time", $"host", $"hits")
  *   .write.format("druid-segments")
  *   .mode("append")                       // Druid versioned-overwrite semantics
  *   .option("dataSource", "events")
  *   .option("segmentGranularity", "DAY")  // ALL | MINUTE | HOUR | DAY | WEEK | ISO-8601 duration
  *   .option("version", "2026-01-01T00:00:00Z")  // default: wall-clock ISO instant
  *   .save("/deep/storage/root")
  * }}}
  *
  * Schema mapping (validated, loud errors): `__time` (LongType epoch
  * ms or TimestampType) is required; StringType → string dim,
  * ArrayType(String) → multi-value dim, LongType → long metric,
  * FloatType → float metric, DoubleType → double metric. Nulls are
  * refused at write (real Druid coerces; silent coercion would make
  * the roundtrip lossy).
  *
  * Scale/commit protocol:
  *  - Each task buffers rows per time chunk and flushes a SEGMENT per
  *    (task, chunk) — plus extra shards when a chunk exceeds
  *    `maxRowsPerSegment` (default 5M, Druid's own default) — so a
  *    1000-task write of a year of data produces independent shards
  *    with no driver bottleneck. Rows within a segment are sorted by
  *    `__time` by the segment writer (Druid's storage invariant).
  *  - Tasks upload ONLY `index.zip` into a fresh UUID dir under the
  *    final chunk/version layout, via the Hadoop FS API (local/HDFS/
  *    s3a alike). Discovery keys on `descriptor.json`, which does NOT
  *    exist yet — so in-flight (and speculative/failed-task orphan)
  *    segments are invisible to every reader.
  *  - `commit()` assigns numbered shard ids per chunk across all task
  *    messages and publishes each segment by writing its
  *    `descriptor.json` — the same publish-by-descriptor protocol the
  *    rest of the deep-store tooling uses. A new version over an
  *    already-written chunk OVERSHADOWS the old one in the timeline
  *    (Druid's overwrite semantics); committing the SAME version twice
  *    into a chunk is refused (Druid versions are immutable).
  *  - `abort()` deletes the staged dirs named in the received commit
  *    messages; unreported orphans stay invisible (no descriptor) and
  *    cost only storage until a cleanup pass.
  *
  * Layout: `root/<dataSource>/<startMs>_<endMs>/<version>/<uuid>/`
  * (millis in dir names — interval truth lives in the descriptor,
  * which discovery reads; colon-free names stay HDFS-legal).
  */
private[sources] object DruidSegmentsWrite {

  /** Uniform segment granularities only (a Druid MONTH/YEAR chunk is
    * calendar-dependent; this writer keeps chunking a pure floorDiv).
    * None = ALL (one chunk spanning the data). */
  def granularityMs(name: String): Option[Long] = name.toUpperCase match {
    case "ALL" => None
    case "MINUTE" => Some(60L * 1000)
    case "FIFTEEN_MINUTE" => Some(15L * 60 * 1000)
    case "THIRTY_MINUTE" => Some(30L * 60 * 1000)
    case "HOUR" => Some(3600L * 1000)
    case "SIX_HOUR" => Some(6L * 3600 * 1000)
    case "DAY" => Some(86400L * 1000)
    case "WEEK" => Some(7L * 86400 * 1000)
    case iso if iso.startsWith("P") =>
      val ms = java.time.Duration.parse(iso).toMillis
      require(ms > 0, s"segmentGranularity $name must be positive")
      Some(ms)
    case other => throw new IllegalArgumentException(
      s"segmentGranularity '$other' unsupported — use ALL, MINUTE, " +
        "FIFTEEN_MINUTE, THIRTY_MINUTE, HOUR, SIX_HOUR, DAY, WEEK, or an " +
        "ISO-8601 duration (PT6H, P1D); calendar MONTH/YEAR chunks are " +
        "not uniform and are deliberately unsupported")
  }

  sealed trait Kind
  case object KTime extends Kind
  case object KTimeMicros extends Kind
  case object KStr extends Kind
  case object KMv extends Kind
  case object KLong extends Kind
  case object KFloat extends Kind
  case object KDouble extends Kind
  final case class KComplex(typeName: String) extends Kind

  final case class ColPlan(name: String, idx: Int, kind: Kind)

  /** Parse the `complexMetrics` option ("col:typeName,col2:type2") —
    * the writer cannot guess what a binary column holds, and a complex
    * metric's declared type is load-bearing at read time (it picks the
    * deserializer, e.g. hyperUnique → Druid HLLC). */
  def complexTypes(spec: String): Map[String, String] =
    spec.split(",").filter(_.nonEmpty).map { kv =>
      kv.split(":", 2) match {
        case Array(c, t) if c.nonEmpty && t.nonEmpty => c.trim -> t.trim
        case _ => throw new IllegalArgumentException(
          s"complexMetrics entry '$kv' — expected 'column:typeName'")
      }
    }.toMap

  /** Validate the query schema into a column plan. */
  def plan(schema: StructType,
           complex: Map[String, String] = Map.empty): (ColPlan, Seq[ColPlan]) = {
    val timeIdx = schema.fieldNames.indexOf("__time")
    require(timeIdx >= 0,
      s"druid-segments write needs a `__time` column (epoch-ms long or " +
        s"timestamp); got schema ${schema.simpleString}")
    val timeKind = schema.fields(timeIdx).dataType match {
      case LongType => KTime
      case TimestampType | TimestampNTZType => KTimeMicros
      case dt => throw new IllegalArgumentException(
        s"__time must be LongType (epoch ms) or TimestampType, got ${dt.simpleString}")
    }
    val cols = schema.fields.zipWithIndex.filter(_._1.name != "__time").map {
      case (f, i) => f.dataType match {
        case StringType => ColPlan(f.name, i, KStr)
        case ArrayType(StringType, _) => ColPlan(f.name, i, KMv)
        case LongType | IntegerType | ShortType | ByteType => ColPlan(f.name, i, KLong)
        case FloatType => ColPlan(f.name, i, KFloat)
        case DoubleType => ColPlan(f.name, i, KDouble)
        case BinaryType if complex.contains(f.name) =>
          ColPlan(f.name, i, KComplex(complex(f.name)))
        case BinaryType => throw new IllegalArgumentException(
          s"druid-segments: binary column `${f.name}` needs its complex " +
            "type declared — .option(\"complexMetrics\", " +
            s"\"${f.name}:hyperUnique\") (the declared type picks the " +
            "reader's deserializer; an undeclared binary blob would be " +
            "unreadable as a Druid metric)")
        case dt => throw new IllegalArgumentException(
          s"druid-segments cannot write column `${f.name}` of type " +
            s"${dt.simpleString}: supported are string (dim), " +
            "array<string> (multi-value dim), long/int (long metric), " +
            "float, double, binary (with complexMetrics declared)")
      }
    }
    (ColPlan("__time", timeIdx, timeKind), cols.toSeq)
  }

  /** One staged (uploaded, not yet published) segment. */
  final case class StagedSegment(chunkStart: Long, chunkEnd: Long,
                                 dir: String, rows: Long) extends Serializable

  final case class CommitMsg(segments: Seq[StagedSegment]) extends WriterCommitMessage
}

private[sources] class DruidWriteBuilder(
    info: LogicalWriteInfo,
    root: String,
    options: org.apache.spark.sql.util.CaseInsensitiveStringMap)
  extends WriteBuilder {

  override def build(): Write = new Write {
    override def toBatch: BatchWrite = {
      val dataSource = Option(options.get("dataSource")).getOrElse(
        throw new IllegalArgumentException(
          "druid-segments write: option 'dataSource' is required"))
      val granMs = DruidSegmentsWrite.granularityMs(
        Option(options.get("segmentGranularity")).getOrElse("DAY"))
      val version = Option(options.get("version"))
        .getOrElse(java.time.Instant.now().toString)
      val maxRows = Option(options.get("maxRowsPerSegment")).map(_.toInt)
        .getOrElse(5000000)
      require(maxRows >= 1, s"maxRowsPerSegment must be >= 1, got $maxRows")
      // values per LZ4 chunk — the production default (4096) keeps the
      // chunk index small and decode sequential; the fixture writer's
      // tiny default exists only to exercise multi-chunk decode paths
      val rowsPerChunk = Option(options.get("rowsPerChunk")).map(_.toInt)
        .getOrElse(4096)
      require(rowsPerChunk >= 1, s"rowsPerChunk must be >= 1, got $rowsPerChunk")
      val complex = Option(options.get("complexMetrics"))
        .map(DruidSegmentsWrite.complexTypes).getOrElse(Map.empty)
      val appendShards = Option(options.get("appendShards")).exists(_.toBoolean)
      // schema validated ONCE at planning — a bad column fails the
      // write before any task runs
      DruidSegmentsWrite.plan(info.schema(), complex)
      val conf = new DruidSegmentReader.SerializableConfiguration(
        org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
      new DruidBatchWrite(root, dataSource, granMs, version, maxRows,
        rowsPerChunk, complex, appendShards, info.schema(), conf)
    }
  }
}

private[sources] class DruidBatchWrite(
    root: String, dataSource: String, granMs: Option[Long], version: String,
    maxRows: Int, rowsPerChunk: Int, complex: Map[String, String],
    appendShards: Boolean, schema: StructType,
    conf: DruidSegmentReader.SerializableConfiguration) extends BatchWrite {

  override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
    DruidDataWriterFactory(root, dataSource, granMs, version, maxRows,
      rowsPerChunk, complex, schema, conf)

  /** Publish: assign numbered shard ids per chunk across every task's
    * staged segments, then write each segment's descriptor.json — the
    * visibility flip.
    *
    * Default (`appendShards = false`): refuses to publish into a
    * (chunk, version) that already holds published segments — Druid
    * versions are immutable; overwrite by writing a LATER version
    * (it overshadows).
    *
    * `appendShards = true` (Druid's append-lock ingestion shape, the
    * streaming path): new shards EXTEND the version — numbering starts
    * after the existing max partitionNum and descriptors carry
    * `partitions: 0` (NumberedShardSpec's "unknown count" convention;
    * the timeline keys on shard identity only, so earlier descriptors'
    * stale totals are harmless). Same-version rows accumulate instead
    * of overshadowing — exactly what a micro-batch event stream needs.
    * Contract: ONE appender per (dataSource, version) at a time (the
    * role Druid's overlord append lock plays) — Structured Streaming
    * guarantees it within a query; two concurrent appending JOBS on
    * the same version could race the read-assign-publish and collide
    * shard numbers. Concurrent writers should use distinct versions. */
  override def commit(messages: Array[WriterCommitMessage]): Unit = {
    val staged = messages.flatMap {
      case DruidSegmentsWrite.CommitMsg(segs) => segs
      case other => throw new IllegalStateException(s"unexpected commit message $other")
    }
    val hconf = conf.value
    val byChunk = staged.groupBy(s => (s.chunkStart, s.chunkEnd))
    byChunk.foreach { case ((lo, hi), segs) =>
      // already-published shards under this chunk/version dir?
      val versionDir = new HPath(s"$root/$dataSource/${lo}_$hi/$version")
      val fs = versionDir.getFileSystem(hconf)
      val existingShards: Seq[Int] =
        if (!fs.exists(versionDir)) Nil
        else fs.listStatus(versionDir).toSeq.flatMap { st =>
          val d = new HPath(st.getPath, "descriptor.json")
          if (st.isDirectory && fs.exists(d)) {
            val in = fs.open(d)
            val text = try new String(
              org.apache.commons.io.IOUtils.toByteArray(in),
              StandardCharsets.UTF_8) finally in.close()
            Some(DruidDeepStorage.parseDescriptor(text, st.getPath.toString).shardNum)
          } else None
        }
      require(appendShards || existingShards.isEmpty,
        s"druid-segments: chunk [$lo,$hi) of '$dataSource' already has " +
          s"published segments at version '$version' — Druid versions are " +
          "immutable; write a later version to overwrite (it overshadows), " +
          "or pass .option(\"appendShards\", \"true\") to extend the " +
          "version with new shards (streaming ingestion)")
      val base = if (existingShards.isEmpty) 0 else existingShards.max + 1
      val ordered = segs.sortBy(_.dir) // deterministic shard numbering
      val total = ordered.length
      ordered.zipWithIndex.foreach { case (s, i) =>
        val shard = base + i
        val iso = (ms: Long) => java.time.Instant.ofEpochMilli(ms).toString
        // append mode always numbers with partitions=0 (unknown count,
        // more shards may follow); fresh one-shot writes keep the
        // exact-total numbered spec (or "none" for a single shard)
        val shardJson =
          if (appendShards)
            s"""{"type":"numbered","partitionNum":$shard,"partitions":0}"""
          else if (total == 1) """{"type":"none"}"""
          else s"""{"type":"numbered","partitionNum":$shard,"partitions":$total}"""
        val shardSuffix = if (!appendShards && total == 1) "" else s"_$shard"
        val ident = s"${dataSource}_${iso(lo)}_${iso(hi)}_$version$shardSuffix"
        val descriptor =
          s"""{"binaryVersion":9,"dataSource":"$dataSource",
             |"interval":"${iso(lo)}/${iso(hi)}",
             |"version":"$version","shardSpec":$shardJson,
             |"loadSpec":{"type":"hdfs","path":"${s.dir}/index.zip"},
             |"identifier":"$ident",
             |"size":${s.rows}}""".stripMargin
        val p = new HPath(s.dir, "descriptor.json")
        val out = p.getFileSystem(hconf).create(p, true)
        try out.write(descriptor.getBytes(StandardCharsets.UTF_8)) finally out.close()
      }
    }
    // publish is the visibility flip — drop any catalog listing cache
    // over this root so same-session SELECT FROM druid.<ds> sees the
    // new segments immediately (not after the listing TTL)
    DruidCatalog.invalidateRoot(root)
  }

  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    val hconf = conf.value
    messages.collect { case DruidSegmentsWrite.CommitMsg(segs) => segs }
      .flatten.foreach { s =>
        val p = new HPath(s.dir)
        try p.getFileSystem(hconf).delete(p, true)
        catch { case _: Exception => () } // best-effort; dirs stay invisible
      }
  }
}

private[sources] final case class DruidDataWriterFactory(
    root: String, dataSource: String, granMs: Option[Long], version: String,
    maxRows: Int, rowsPerChunk: Int, complex: Map[String, String],
    schema: StructType,
    conf: DruidSegmentReader.SerializableConfiguration) extends DataWriterFactory {

  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DruidDataWriter(root, dataSource, granMs, version, maxRows,
      rowsPerChunk, complex, schema, conf)
}

/** Per-task writer: buffers rows per time chunk, flushing a segment
  * whenever a chunk's buffer reaches `maxRows` and once per chunk at
  * commit. Buffer memory is bounded by maxRows × live chunks; feed a
  * chunk-clustered DataFrame (e.g. `df.repartition($"__time" div
  * chunkMs)`) to keep one live chunk per task at large scale. */
private[sources] class DruidDataWriter(
    root: String, dataSource: String, granMs: Option[Long], version: String,
    maxRows: Int, rowsPerChunk: Int, complex: Map[String, String],
    schema: StructType,
    conf: DruidSegmentReader.SerializableConfiguration)
  extends DataWriter[InternalRow] {

  import DruidSegmentsWrite._

  private val (timePlan, colPlans) = DruidSegmentsWrite.plan(schema, complex)

  private final class ChunkBuf {
    val times = mutable.ArrayBuffer[Long]()
    val cols: Array[mutable.ArrayBuffer[Any]] =
      Array.fill(colPlans.length)(mutable.ArrayBuffer[Any]())
    def size: Int = times.length
  }

  private val buffers = mutable.LinkedHashMap[Long, ChunkBuf]()
  private val staged = mutable.ArrayBuffer[StagedSegment]()

  private def chunkStartOf(t: Long): Long = granMs match {
    case Some(g) => Math.floorDiv(t, g) * g
    case None => Long.MinValue // single ALL chunk, interval resolved at flush
  }

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(timePlan.idx), "druid-segments: null __time row refused")
    val t = timePlan.kind match {
      case KTime => row.getLong(timePlan.idx)
      case _ => Math.floorDiv(row.getLong(timePlan.idx), 1000L) // micros → ms
    }
    val buf = buffers.getOrElseUpdate(chunkStartOf(t), new ChunkBuf)
    buf.times += t
    var i = 0
    while (i < colPlans.length) {
      val cp = colPlans(i)
      require(!row.isNullAt(cp.idx),
        s"druid-segments: null in column `${cp.name}` refused (Druid " +
          "columns are physically non-null; coerce or filter before writing)")
      buf.cols(i) += (cp.kind match {
        case KStr => row.getUTF8String(cp.idx).toString
        case KMv =>
          val a = row.getArray(cp.idx)
          (0 until a.numElements()).map { j =>
            require(!a.isNullAt(j),
              s"druid-segments: null element in multi-value dim `${cp.name}` refused")
            a.getUTF8String(j).toString
          }
        case KLong => schema.fields(cp.idx).dataType match {
          case LongType => row.getLong(cp.idx)
          case IntegerType => row.getInt(cp.idx).toLong
          case ShortType => row.getShort(cp.idx).toLong
          case ByteType => row.getByte(cp.idx).toLong
          case _ => row.getLong(cp.idx)
        }
        case KFloat => row.getFloat(cp.idx)
        case KDouble => row.getDouble(cp.idx)
        case KComplex(_) => row.getBinary(cp.idx).clone()
        case KTime | KTimeMicros => throw new IllegalStateException("unreachable")
      })
      i += 1
    }
    if (buf.size >= maxRows) {
      flush(chunkStartOf(t), buf)
      buffers.remove(chunkStartOf(t))
    }
  }

  private def flush(chunkStart: Long, buf: ChunkBuf): Unit = {
    if (buf.size == 0) return
    val (lo, hi) = granMs match {
      case Some(g) => (chunkStart, chunkStart + g)
      case None => (buf.times.min, buf.times.max + 1) // ALL: tight data interval
    }
    val cols: Seq[DruidSegmentWriter.Col] = colPlans.zipWithIndex.map {
      case (cp, i) => cp.kind match {
        case KStr => DruidSegmentWriter.StrDim(cp.name,
          buf.cols(i).toSeq.asInstanceOf[Seq[String]])
        case KMv => DruidSegmentWriter.MvDim(cp.name,
          buf.cols(i).toSeq.asInstanceOf[Seq[Seq[String]]])
        case KLong => DruidSegmentWriter.LongMet(cp.name,
          buf.cols(i).toSeq.asInstanceOf[Seq[Long]])
        case KFloat => DruidSegmentWriter.FloatMet(cp.name,
          buf.cols(i).toSeq.asInstanceOf[Seq[Float]])
        case KDouble => DruidSegmentWriter.DoubleMet(cp.name,
          buf.cols(i).toSeq.asInstanceOf[Seq[Double]])
        case KComplex(t) => DruidSegmentWriter.ComplexMet(cp.name, t,
          buf.cols(i).toSeq.asInstanceOf[Seq[Array[Byte]]])
        case KTime | KTimeMicros => throw new IllegalStateException("unreachable")
      }
    }.toSeq
    // write locally (the segment writer is a local-file binary
    // builder), upload index.zip ONLY — no descriptor until commit
    val tmp = java.nio.file.Files.createTempDirectory("graft_druid_write_").toFile
    try {
      DruidSegmentWriter.write(tmp, dataSource, buf.times.toSeq, cols, lo, hi,
        version = version, sizePer = rowsPerChunk)
      val uuid = UUID.randomUUID().toString
      val destDir = s"$root/$dataSource/${lo}_$hi/$version/$uuid"
      val dest = new HPath(destDir)
      val fs = dest.getFileSystem(conf.value)
      fs.mkdirs(dest)
      fs.copyFromLocalFile(new HPath(new java.io.File(tmp, "index.zip").getAbsolutePath),
        new HPath(dest, "index.zip"))
      staged += StagedSegment(lo, hi, destDir, buf.size.toLong)
    } finally {
      tmp.listFiles().foreach(_.delete())
      tmp.delete()
    }
  }

  override def commit(): WriterCommitMessage = {
    buffers.foreach { case (c, b) => flush(c, b) }
    buffers.clear()
    CommitMsg(staged.toSeq)
  }

  override def abort(): Unit = {
    // delete anything this task already uploaded; never-published
    // (descriptor-less) leftovers are invisible regardless
    staged.foreach { s =>
      val p = new HPath(s.dir)
      try p.getFileSystem(conf.value).delete(p, true)
      catch { case _: Exception => () }
    }
  }

  override def close(): Unit = ()
}
