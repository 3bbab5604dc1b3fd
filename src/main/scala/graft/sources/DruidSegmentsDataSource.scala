package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.model.DictPred

/** Druid deep storage as a first-class Spark DataSource V2 table —
  * the Spark-native re-expression of the reference's Hadoop
  * InputFormat entry point (druid-mr/DruidInputFormat.java:44-120,
  * which exposes a (dataSource, interval) segment list as MapReduce
  * splits):
  *
  * {{{
  * spark.read.format("druid-segments")
  *   .option("dataSource", "events")        // optional when the tree has one
  *   .load("/deep/storage/root")
  *   .where($"__time" >= t0 && $"host" === "a")   // pushed down
  *   .select("__time", "hits")                    // pruned at decode
  * }}}
  *
  * Where the hand-rolled [[DruidDeepStorage.scan]] needs projection
  * and filter passed as arguments, here Catalyst drives them through
  * the V2 pushdown hooks, so the same pruning happens for plain SQL
  * over the table:
  *
  *  - '''Column pruning''' (`SupportsPushDownRequiredColumns`) reaches
  *    the binary decoder: unprojected columns' bytes are never
  *    decompressed (DruidSegmentReader decodes only the requested
  *    internal smoosh files).
  *  - '''Filter pushdown''' (`SupportsPushDownFilters`): `__time`
  *    bounds tighten the scan interval BEFORE timeline resolution, so
  *    out-of-interval segments are never planned as partitions (the
  *    reference's interval argument, now inferred from the WHERE
  *    clause); string-dimension equality/IN conjuncts feed the
  *    Druid-native dictionary short-circuit — a segment whose
  *    dictionary provably contains no matching value skips row decode
  *    entirely. All filters are also left for Spark to re-evaluate
  *    above the scan (same contract as the built-in file sources):
  *    the source prunes work, Spark owns exactness.
  *  - '''Statistics''' (`SupportsReportStatistics`): sizeInBytes =
  *    Σ index.zip bytes of the planned (post-pushdown) windows, so AQE
  *    and the broadcast-join threshold see a real, filter-aware size
  *    instead of defaulting to "huge".
  *
  * One InputPartition per timeline-visible segment window (Druid
  * builds ~500 MB segments — the natural split, exactly the
  * reference's WindowedDataSegment granularity), so a 100 TB
  * datasource plans ~200k independent decode tasks with no driver
  * bottleneck beyond the descriptor listing the reference also does.
  */
class DruidSegmentsDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "druid-segments"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val spark = SparkSession.active
    val segs = DruidSegmentsDataSource.discover(spark, options)
    // UNION schema across TIMELINE-VISIBLE segments: Druid datasources
    // evolve their dimension set per-interval, so no single segment is
    // authoritative — but overshadowed generations can never be read,
    // so they neither widen the schema nor get to fail the
    // type-conflict check. Columns a segment lacks decode as null
    // there; conflicting types fail loudly
    // (DruidSegmentReader.unionSchema). Probes are cached per path
    // (segments are immutable).
    val visible = VersionedTimeline.resolve(segs, Long.MinValue, Long.MaxValue)
      .map(_.segment.path).distinct
    DruidSegmentReader.unionSchema(spark, visible)
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new DruidSegmentsTable(schema, new CaseInsensitiveStringMap(properties))
}

private[sources] object DruidSegmentsDataSource {

  /** Driver-side descriptor discovery + dataSource filter (one
    * recursive listing — the same O(#segments) planning cost as the
    * reference's overlord segment-list action). */
  def discover(spark: SparkSession, options: CaseInsensitiveStringMap): Seq[SegmentDescriptor] = {
    val root = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "druid-segments: option 'path' (deep-storage root) is required — " +
          "spark.read.format(\"druid-segments\").load(<root>)"))
    val all = DruidDeepStorage.discover(spark, root)
    val segs = Option(options.get("dataSource")) match {
      case Some(ds) => all.filter(_.dataSource == ds)
      case None =>
        val names = all.map(_.dataSource).distinct
        require(names.size <= 1,
          s"druid-segments: tree at $root holds dataSources ${names.mkString(", ")} — " +
            "pass .option(\"dataSource\", ...) to pick one")
        all
    }
    require(segs.nonEmpty, s"druid-segments: no segments under $root" +
      Option(options.get("dataSource")).map(ds => s" for dataSource '$ds'").getOrElse(""))
    segs
  }
}

private[sources] class DruidSegmentsTable(tableSchema: StructType,
                                          options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {

  override def name(): String = {
    val ds = Option(options.get("dataSource")).map(d => s"/$d").getOrElse("")
    s"druid-segments:${options.get("path")}$ds"
  }

  override def schema(): StructType = tableSchema

  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(caseInsensitiveOptions: CaseInsensitiveStringMap): ScanBuilder =
    new DruidScanBuilder(tableSchema, options)
}

/** Accumulates Catalyst's pushdown into (interval ∩ __time bounds,
  * dictionary-required values, pruned columns) — the exact inputs of
  * [[DruidSegmentReader.decodeWindow]]. */
private[sources] class DruidScanBuilder(fullSchema: StructType,
                                        options: CaseInsensitiveStringMap)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var requiredSchema: StructType = fullSchema
  private var accepted: Array[Filter] = Array.empty
  private var timeLo: Long = Long.MinValue
  private var timeHi: Long = Long.MaxValue
  // dim -> conjunctive dictionary predicates (same law as
  // DimFilter.dictPredicates: every conjunct must find a matching
  // dictionary value, or the segment skips; each conjunct's bitmap
  // union intersects into the decoded row set)
  private var preds: Map[String, Seq[DictPred]] = Map.empty

  private def isScalarString(dim: String): Boolean =
    fullSchema.fields.exists(f => f.name == dim && f.dataType == StringType)

  private def addPred(dim: String, p: DictPred): Unit =
    preds = preds.updated(dim, preds.getOrElse(dim, Nil) :+ p)

  private def longBound(v: Any): Option[Long] = v match {
    case l: Long => Some(l)
    case i: Int => Some(i.toLong)
    case _ => None // non-integral __time comparisons stay Spark-side
  }

  /** True when the conjunct tightens the scan (and is therefore worth
    * REPORTING as pushed); side-effects accumulate the bounds.
    *
    * `timeHi` is EXCLUSIVE, so `=`/`<=` bounds need `t + 1` — which
    * overflows at Long.MaxValue, wrapping the bound to MinValue and
    * planning an incorrectly EMPTY scan. Those conjuncts simply don't
    * push at MaxValue (they tighten nothing real there; Spark still
    * evaluates them exactly above the scan). `>` saturates instead of
    * wrapping: [MaxValue, hi) over-approximates `> MaxValue` by at
    * most the one t==MaxValue row, which the residual filter drops. */
  private def push(f: Filter): Boolean = f match {
    case EqualTo("__time", v) => longBound(v).exists { t =>
      t != Long.MaxValue && {
        timeLo = math.max(timeLo, t); timeHi = math.min(timeHi, t + 1); true
      }
    }
    case GreaterThan("__time", v) => longBound(v).exists { t =>
      timeLo = math.max(timeLo, if (t == Long.MaxValue) t else t + 1); true
    }
    case GreaterThanOrEqual("__time", v) => longBound(v).exists { t =>
      timeLo = math.max(timeLo, t); true
    }
    case LessThan("__time", v) => longBound(v).exists { t =>
      timeHi = math.min(timeHi, t); true
    }
    case LessThanOrEqual("__time", v) => longBound(v).exists { t =>
      t != Long.MaxValue && { timeHi = math.min(timeHi, t + 1); true }
    }
    case EqualTo(d, v: String) if isScalarString(d) =>
      addPred(d, DictPred.Values(Set(v))); true
    case In(d, vs) if isScalarString(d) && vs.nonEmpty && vs.forall(_.isInstanceOf[String]) =>
      addPred(d, DictPred.Values(vs.map(_.asInstanceOf[String]).toSet)); true
    // string ranges/patterns prune via the dictionary: Spark compares
    // strings in binary (UTF-8 byte) order, which DictPred.LexBound
    // mirrors exactly
    case GreaterThan(d, v: String) if isScalarString(d) =>
      addPred(d, DictPred.LexBound(Some(v), lowerStrict = true, None, upperStrict = false)); true
    case GreaterThanOrEqual(d, v: String) if isScalarString(d) =>
      addPred(d, DictPred.LexBound(Some(v), lowerStrict = false, None, upperStrict = false)); true
    case LessThan(d, v: String) if isScalarString(d) =>
      addPred(d, DictPred.LexBound(None, lowerStrict = false, Some(v), upperStrict = true)); true
    case LessThanOrEqual(d, v: String) if isScalarString(d) =>
      addPred(d, DictPred.LexBound(None, lowerStrict = false, Some(v), upperStrict = false)); true
    case StringStartsWith(d, v) if isScalarString(d) =>
      addPred(d, DictPred.Prefix(v)); true
    case StringEndsWith(d, v) if isScalarString(d) =>
      addPred(d, DictPred.Suffix(v)); true
    case StringContains(d, v) if isScalarString(d) =>
      addPred(d, DictPred.Contains(v, caseSensitive = true)); true
    case _ => false
  }

  /** Best-effort contract (the built-in file sources' one): every
    * filter is returned as residual for Spark to evaluate exactly;
    * the accepted subset additionally prunes segments/windows at the
    * source. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(push)
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(schema: StructType): Unit = requiredSchema = schema

  override def build(): Scan =
    new DruidScan(options, requiredSchema, accepted, timeLo, timeHi, preds)
}

private[sources] class DruidScan(options: CaseInsensitiveStringMap,
                                 prunedSchema: StructType,
                                 pushed: Array[Filter],
                                 timeLo: Long, timeHi: Long,
                                 preds: Map[String, Seq[DictPred]])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = prunedSchema

  override def description(): String =
    s"DruidSegments PushedFilters: [${pushed.mkString(", ")}], " +
      s"interval: [$timeLo, $timeHi), ReadColumns: ${readSchema.fieldNames.mkString(", ")}"

  override def toBatch: Batch = this

  /** Timeline resolution under the pushed interval — overshadowed
    * versions and out-of-interval segments never become partitions. */
  private lazy val windows: Seq[WindowedSegment] = {
    val spark = SparkSession.active
    val segs = DruidSegmentsDataSource.discover(spark, options)
    VersionedTimeline.resolve(segs, timeLo, timeHi)
  }

  // Σ index.zip bytes of the PLANNED windows: filter-aware, and the
  // same on-disk convention the parquet source reports, so the
  // broadcast threshold compares like with like. Cached on the Scan
  // (not recomputed per estimateStatistics() call — Spark may ask
  // several times during planning), and None when ANY file status
  // fails: reporting a failed stat as 0 bytes would steer AQE into
  // broadcasting an arbitrarily large table, while "unknown" falls
  // back to Spark's conservative default.
  private lazy val plannedBytes: Option[Long] =
    try {
      val conf = SparkSession.active.sparkContext.hadoopConfiguration
      Some(windows.map(_.segment.path).distinct.map { dir =>
        val p = new HPath(s"$dir/index.zip")
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum)
    } catch { case _: Exception => None }

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): util.OptionalLong =
      plannedBytes.map(util.OptionalLong.of).getOrElse(util.OptionalLong.empty())
    override def numRows(): util.OptionalLong = util.OptionalLong.empty()
  }

  override def planInputPartitions(): Array[InputPartition] =
    windows.map { w =>
      DruidInputPartition(w.segment.path,
        math.max(w.windowStartMs, timeLo), math.min(w.windowEndMs, timeHi),
        readSchema.fieldNames.toSeq, preds)
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory = {
    val conf = new DruidSegmentReader.SerializableConfiguration(
      SparkSession.active.sparkContext.hadoopConfiguration)
    DruidPartitionReaderFactory(conf, readSchema)
  }
}

private[sources] final case class DruidInputPartition(
    segmentDir: String, windowLo: Long, windowHi: Long,
    columns: Seq[String], preds: Map[String, Seq[DictPred]]) extends InputPartition

private[sources] final case class DruidPartitionReaderFactory(
    conf: DruidSegmentReader.SerializableConfiguration,
    schema: StructType) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[DruidInputPartition]
    val toCatalyst = CatalystTypeConverters.createToCatalystConverter(schema)
    val rows = DruidSegmentReader.decodeWindow(
      conf.value, p.segmentDir, p.windowLo, p.windowHi, p.columns, p.preds)
    new PartitionReader[InternalRow] {
      override def next(): Boolean = rows.hasNext
      override def get(): InternalRow = toCatalyst(rows.next()).asInstanceOf[InternalRow]
      override def close(): Unit = ()
    }
  }
}
