package graft.sources

import graft.model.{Aggregators, DimFilter, Granularity}
// (compact() composes scan + ingest; no extra imports)
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Rollup ingestion into — and timeline-resolved scans out of — a
  * time-chunked, versioned segment store on parquet.
  *
  * This is the Spark-native re-expression of the reference's read path
  * (druid-mr/DruidInputFormat.java + druid-pig/DruidStorage.java):
  * Druid's binary segments become parquet files laid out
  * `base/dataSource/version=<v>/chunk=<startMs>/part-*.parquet`, and
  * the scan resolves the same versioned timeline before reading.
  *
  * Scale design:
  *  - chunk = segment granularity (e.g. DAY): interval queries select
  *    chunk directories *before* any IO — the parquet reader never
  *    opens overshadowed or out-of-interval files;
  *  - rollup is a single shuffle (groupBy chunk × bucket × dims) with
  *    map-side partial aggregation; sketch metrics are stored
  *    non-finalized (mergeable bytes), so coarser re-aggregation later
  *    never rescans raw data (≙ Druid complex metric columns,
  *    DruidStorage.java:139-152);
  *  - each chunk is written independently and re-ingesting publishes a
  *    new version that overshadows atomically — idempotent backfills;
  *  - within a chunk, data is repartitioned by dims so same-key rows
  *    co-locate (numShards files per chunk ≙ shard chunks), and each
  *    shard is written sorted by (__time, dims) — Druid's segment sort
  *    order — so parquet row-group min/max stats prune sub-chunk
  *    interval bounds and selective dim filters at scan time.
  */
object SegmentStore {

  /** Metric spec: Druid aggregator JSON (array). Sketch metrics are
    * stored as mergeable bytes; numeric aggs as their finalized type.
    * `rollup=false` (Druid detail tables): rows are stored as-is —
    * each metric spec's fieldName column is carried through under the
    * spec's name, duplicates are preserved, and aggregation happens
    * only at query time. */
  final case class IngestSpec(
      dataSource: String,
      timeCol: String,
      dimensions: Seq[String],
      metricsJson: String,
      queryGranularity: Granularity,
      segmentGranularity: Granularity,
      numShards: Int = 1,
      rollup: Boolean = true)

  /** Rollup `df` and publish it as a new version of its chunks. */
  def ingest(spark: SparkSession, df: DataFrame, spec: IngestSpec, base: String,
             version: String): Seq[SegmentDescriptor] = {
    val prepared = df
      .withColumn("__chunk", unix_millis(spec.segmentGranularity.bucket(col(spec.timeCol))))
      .withColumn("__time", unix_millis(spec.queryGranularity match {
        case Granularity.All | Granularity.None_ => col(spec.timeCol)
        case g => g.bucket(col(spec.timeCol))
      }))

    // shard by dim-tuple hash within each chunk (≙ Druid hashed shard
    // spec): same-key rows co-locate in one shard, each (chunk, shard)
    // writes independently — with numShards=N an ingest fans out over
    // N×chunks tasks instead of funnelling each chunk through one
    val shardCol =
      if (spec.numShards <= 1 || spec.dimensions.isEmpty) lit(0)
      else pmod(xxhash64(spec.dimensions.map(col): _*), lit(spec.numShards)).cast("int")

    val metricSpecs = Aggregators.parseAggs(spec.metricsJson)
    val rolledUp = (if (spec.rollup) {
      val aggs = metricSpecs.map(a =>
        Aggregators.compile(a, df.schema, spec.timeCol, finalize = false))
      prepared
        .groupBy(col("__chunk") +: col("__time") +: spec.dimensions.map(col): _*)
        .agg(aggs.head, aggs.tail: _*)
    } else {
      // detail ingest: no aggregation, metric columns renamed to their
      // spec names (count has no source column → literal 1 per row)
      val metricCols = metricSpecs.map { m =>
        if (m.tpe == "count") lit(1L).as(m.name)
        else col(m.fieldName).as(m.name)
      }
      prepared.select((col("__chunk") +: col("__time") +:
        spec.dimensions.map(col)) ++ metricCols: _*)
    })
      .withColumn("__shard", shardCol)

    val versionDir = s"$base/${spec.dataSource}/version=$version"
    rolledUp
      .repartition(col("__chunk"), col("__shard"))
      // Druid's segment sort order (__time, then dims): parquet row
      // groups get tight min/max stats, so sub-chunk interval bounds
      // AND selective dim filters skip row groups at scan time, and
      // sorted dims dictionary/RLE-compress. Per-partition sort only —
      // the shuffle above already co-located (chunk, shard).
      .sortWithinPartitions(col("__time") +: spec.dimensions.map(col): _*)
      .write.mode("overwrite").partitionBy("__chunk", "__shard").parquet(versionDir)

    // descriptors: one per written (chunk, shard)
    val chunkShards = rolledUp.select("__chunk", "__shard").distinct()
      .collect().map(r => (r.getLong(0), r.getInt(1))).sortBy(identity).toSeq
    val descriptors = chunkShards.map { case (start, shard) =>
      SegmentDescriptor(
        dataSource = spec.dataSource,
        startMs = start,
        endMs = chunkEnd(spec.segmentGranularity, start),
        version = version,
        shardNum = shard,
        numShards = spec.numShards,
        path = s"$versionDir/__chunk=$start/__shard=$shard")
    }
    SegmentCatalog.publish(base, spec.dataSource, descriptors)
    descriptors
  }

  private[graft] def chunkWidthMs(g: Granularity): Long = g match {
    case Granularity.Duration(ms, _) => ms
    case Granularity.Calendar("hour", None) => 3600000L
    case Granularity.Calendar("day", None) => 86400000L
    case Granularity.Calendar("week", None) => 7L * 86400000L
    case other => throw new IllegalArgumentException(
      s"segment granularity must be a fixed width (got $other)")
  }

  private def chunkEnd(g: Granularity, startMs: Long): Long = startMs + chunkWidthMs(g)

  /** Scan spec mirroring the reference's DatasourceIngestionSpec JSON
    * (dataSource/interval/dimensions/metrics/filter/granularity). */
  final case class ScanSpec(
      dataSource: String,
      intervalStartMs: Long,
      intervalEndMs: Long,
      dimensions: Seq[String],
      metrics: Seq[String],
      filterJson: Option[String] = None)

  /** Compaction: re-read an interval through the timeline and publish
    * it back at a coarser query granularity under a new version — the
    * Druid compaction task. Sketch metrics merge from stored bytes and
    * counts re-sum (reaggSpec), so no raw data is touched; the new
    * version overshadows the fine-grained segments atomically.
    */
  def compact(spark: SparkSession, base: String, dataSource: String,
              startMs: Long, endMs: Long,
              dimensions: Seq[String], metricsJson: String,
              queryGranularity: Granularity, segmentGranularity: Granularity,
              version: String): Seq[SegmentDescriptor] = {
    val metricNames = Aggregators.parseAggs(metricsJson).map(_.name)
    val scanned = scan(spark, base, ScanSpec(dataSource, startMs, endMs,
      dimensions, metricNames))
    val withTs = scanned.withColumn("__ts", timestamp_millis(col("__time")))
    ingest(spark, withTs, IngestSpec(
      dataSource = dataSource,
      timeCol = "__ts",
      dimensions = dimensions,
      metricsJson = Aggregators.reaggSpec(metricsJson),
      queryGranularity = queryGranularity,
      segmentGranularity = segmentGranularity), base, version)
  }

  /** Druid "kill task": drop segments that contribute NO visible
    * window to the current timeline (fully overshadowed by newer
    * versions) — the storage-reclaim counterpart of version-on-ingest.
    * Partially-overshadowed segments still serve their visible rows
    * and are kept. Ordering is crash-safe: the catalog is rewritten
    * WITHOUT the killed descriptors first, files are deleted second —
    * an interruption leaves orphaned files (harmless, re-vacuumable),
    * never a descriptor pointing at deleted data. The read-modify-write
    * runs under the catalog's per-datasource write lock, so a vacuum
    * racing a concurrent publish can neither drop the publish nor
    * resurrect killed descriptors (the lost-update pair of an
    * unsynchronized RMW; Druid serializes this through the overlord's
    * transactional metadata store).
    * @return the killed descriptors */
  def vacuum(base: String, dataSource: String): Seq[SegmentDescriptor] = {
    def key(s: SegmentDescriptor) = (s.version, s.startMs, s.shardNum)
    var kill: Seq[SegmentDescriptor] = Nil
    SegmentCatalog.mutate(base, dataSource) { all =>
      if (all.isEmpty) { kill = Nil; all }
      else {
        val lo = all.map(_.startMs).min
        val hi = all.map(_.endMs).max
        val visible = VersionedTimeline.resolve(all, lo, hi).map(w => key(w.segment)).toSet
        val (keep, k) = all.partition(s => visible.contains(key(s)))
        kill = k
        keep
      }
    }
    // files go second, outside the lock: the catalog no longer
    // references them, so a concurrent reader/publisher can't see them
    kill.foreach { s =>
      val p = new org.apache.hadoop.fs.Path(s.path)
      SegmentCatalog.fsFor(p).delete(p, true)
    }
    kill
  }

  /** Timeline-resolved read. Only the winning (segment × window)
    * parquet paths are opened; each is clipped to its window, so
    * partially-overshadowed old segments contribute only their
    * still-visible rows. Segments sharing a window (all shards of a
    * chunk, runs of identically-clipped chunks) are read as ONE
    * multi-path scan node — a year of daily chunks plans as a handful
    * of scans, not hundreds. */
  def scan(spark: SparkSession, base: String, spec: ScanSpec): DataFrame = {
    val segments = SegmentCatalog.read(base, spec.dataSource)
    val windows = VersionedTimeline.resolve(segments, spec.intervalStartMs, spec.intervalEndMs)

    val projection: Seq[String] = "__time" +: (spec.dimensions ++ spec.metrics)

    // Fully-visible segments (window == segment bounds) carry no
    // overshadowed rows — ingest buckets rows into their chunk, so no
    // per-segment clip is needed and ALL of them read as one multi-path
    // scan (clipped only to the query interval, which pushes to parquet
    // stats). Partially-overshadowed segments keep per-window clips.
    val (full, partial) = windows.partition(w =>
      w.windowStartMs == w.segment.startMs && w.windowEndMs == w.segment.endMs)
    val fullScan: Seq[DataFrame] =
      if (full.isEmpty) Nil
      else Seq(spark.read.parquet(full.map(_.segment.path).sorted: _*)
        .filter(col("__time") >= lit(spec.intervalStartMs) &&
                col("__time") < lit(spec.intervalEndMs))
        .select(projection.map(col): _*))
    val perWindow: Seq[DataFrame] = fullScan ++ partial
      .groupBy(w => (w.windowStartMs, w.windowEndMs)).toSeq
      .sortBy(_._1)
      .map { case ((lo, hi), ws) =>
        spark.read.parquet(ws.map(_.segment.path).sorted: _*)
          .filter(col("__time") >= lit(lo) && col("__time") < lit(hi))
          .select(projection.map(col): _*)
      }
    if (perWindow.isEmpty) {
      // empty result with the right shape: read nothing
      throw new IllegalArgumentException(
        s"no segments for ${spec.dataSource} in [${spec.intervalStartMs}, ${spec.intervalEndMs})")
    }
    val unioned = perWindow.reduce(_ unionByName _)
    spec.filterJson match {
      case Some(j) => unioned.filter(DimFilter.parse(j).compile(unioned.schema))
      case None => unioned
    }
  }
}
