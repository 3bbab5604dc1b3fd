package graft.streaming

import graft.model.{Aggregators, DimFilter, Granularity}
import org.apache.spark.sql.{DataFrame, SparkSession}
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
    * publishes its windows as version `b<batchId>` — monotonically
    * increasing, so updates to a window overshadow prior publications
    * of the same chunk in the timeline. */
  def toSegmentStore(spark: SparkSession, rolled: DataFrame, spec: StreamSpec,
                     base: String, checkpoint: Option[String] = None): DataStreamWriter[Row] = {
    val w = rolled.writeStream
      .outputMode(OutputMode.Update)
      .trigger(Trigger.AvailableNow())
    checkpoint.foreach(c => w.option("checkpointLocation", c))
    w
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val withTs = batch.withColumn(spec.timeCol, timestamp_millis(col("__time")))
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
      }
  }

}
