package graft.streaming

import graft.model.{Aggregators, DimFilter, Granularity}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}
import org.apache.spark.sql.Row

/** Streaming rollup ingestion — the realtime half of Druid's data
  * model, re-expressed as Structured Streaming.
  *
  * Druid's realtime tasks consume a stream, roll rows up at query
  * granularity, and periodically hand finished chunks to deep storage,
  * where the batch timeline (SegmentStore) takes over. Here:
  *
  *   readStream → [interval/dim filter] → watermark(ts) →
  *   groupBy(window(ts, queryGranularity), dims) → agg(metric specs) →
  *   foreachBatch: SegmentStore.ingest(batch, version = batchId)
  *
  * The watermark bounds state (late events beyond `lateness` are
  * dropped, ≙ Druid's windowPeriod); update-mode batches re-publish a
  * chunk as a newer version, so the segment timeline resolves exactly
  * like a Druid handoff — readers always see each chunk's latest
  * complete rollup. State is per (window × dims) — O(active windows),
  * not O(rows).
  */
object StreamingRollup {

  final case class StreamSpec(
      dataSource: String,
      timeCol: String,
      dimensions: Seq[String],
      metricsJson: String,
      queryGranularity: String = "1 minute",
      segmentGranularity: Granularity = Granularity.Calendar("hour"),
      lateness: String = "10 minutes",
      filterJson: Option[String] = None)

  /** The rollup transform (stream-agnostic: works on any streaming or
    * batch DataFrame with the spec's columns). */
  def rollup(df: DataFrame, spec: StreamSpec): DataFrame = {
    val filtered = spec.filterJson match {
      case Some(j) => df.filter(DimFilter.parse(j).compile(df.schema))
      case None => df
    }
    val aggs = Aggregators.parseAggs(spec.metricsJson)
      .map(a => Aggregators.compile(a, df.schema, spec.timeCol, finalize = false))
    filtered
      .withWatermark(spec.timeCol, spec.lateness)
      .groupBy(
        window(col(spec.timeCol), spec.queryGranularity).as("__window") +:
        spec.dimensions.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("__time", unix_millis(col("__window.start")))
      .drop("__window")
  }

  /** Wire the rolled-up stream into the segment store: each micro-batch
    * publishes new versions of the chunks it touches, which overshadow
    * prior publications of those chunks in the timeline.
    *
    * Update-mode batches carry ONLY the groups that changed in the
    * micro-batch, but a published chunk version overshadows the WHOLE
    * chunk — so before publishing, the currently-visible contents of
    * each touched chunk are re-read through the timeline and groups not
    * re-emitted in this batch are carried forward. Without this merge,
    * a group emitted only in an earlier batch would be erased by the
    * next publication of its chunk. (≙ Druid realtime handoff, which
    * also rewrites whole segments.) Untouched chunks are not re-read or
    * re-published, so per-batch IO is O(touched chunks), and the merge
    * is a key-anti-join on (window × dims) — null-safe, since dims may
    * legitimately be NULL. */
  def toSegmentStore(spark: SparkSession, rolled: DataFrame, spec: StreamSpec,
                     base: String, checkpoint: Option[String] = None): DataStreamWriter[Row] = {
    val w = rolled.writeStream
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w
      .foreachBatch { (batch0: DataFrame, batchId: Long) =>
        val batch = batch0.persist()
        try {
          if (!batch.isEmpty) {
            val metricNames = Aggregators.parseAggs(spec.metricsJson).map(_.name)
            val cols = "__time" +: (spec.dimensions ++ metricNames)
            def chunkOf(tMs: Column): Column =
              unix_millis(spec.segmentGranularity.bucket(timestamp_millis(tMs)))

            val touched = batch.select(chunkOf(col("__time")).as("c"))
              .distinct().collect().map(_.getLong(0))
            val existing: Option[DataFrame] =
              if (touched.isEmpty) None
              else try {
                val hi = touched.max +
                  graft.sources.SegmentStore.chunkWidthMs(spec.segmentGranularity)
                val visible = graft.sources.SegmentStore.scan(
                  spark, base, graft.sources.SegmentStore.ScanSpec(
                    spec.dataSource, touched.min, hi, spec.dimensions, metricNames))
                Some(visible.filter(chunkOf(col("__time")).isin(touched.toSeq: _*)))
              } catch { case _: IllegalArgumentException => None } // nothing published yet

            val toPublish = existing match {
              case None => batch.select(cols.map(col): _*)
              case Some(ex) =>
                val keys = "__time" +: spec.dimensions
                val batchKeys = batch.select(keys.map(col): _*).dropDuplicates()
                val cond = keys.map(k => ex(k) <=> batchKeys(k)).reduce(_ && _)
                val carried = ex.join(batchKeys, cond, "left_anti")
                carried.select(cols.map(col): _*)
                  .unionByName(batch.select(cols.map(col): _*))
            }

            val withTs = toPublish.withColumn(spec.timeCol, timestamp_millis(col("__time")))
            graft.sources.SegmentStore.ingest(
              spark, withTs,
              graft.sources.SegmentStore.IngestSpec(
                dataSource = spec.dataSource,
                timeCol = spec.timeCol,
                dimensions = spec.dimensions,
                // already rolled up: re-aggregate pre-rolled partials
                metricsJson = Aggregators.reaggSpec(spec.metricsJson),
                queryGranularity = Granularity.None_,
                segmentGranularity = spec.segmentGranularity),
              base,
              version = f"b$batchId%012d")
            ()
          }
        } finally batch.unpersist()
      }
  }

}
