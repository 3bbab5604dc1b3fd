package graft.model

import org.json4s._
import org.json4s.jackson.JsonMethods

/** The reference's `DatasourceIngestionSpec` JSON dialect
  * (druid-mr/DruidInputFormat.java:44-57 — `druid.datasource.schema`;
  * druid-pig/PigSegmentLoadSpec.java:29-82): dataSource, interval(s),
  * granularity, dimensions, metrics, optional filter. Parsed here into
  * the typed spec that drives SegmentStore scans, so a reference user's
  * existing read-spec JSON keeps working verbatim.
  */
final case class IngestionSpec(
    dataSource: String,
    intervals: Seq[(Long, Long)],
    dimensions: Seq[String],
    metrics: Seq[String],
    granularity: Granularity,
    filter: Option[DimFilter],
    filterJson: Option[String])

object IngestionSpec {

  def parse(json: String): IngestionSpec = {
    val j = JsonMethods.parse(json)
    def str(k: String): Option[String] = (j \ k) match {
      case JString(s) => Some(s); case _ => None
    }
    def strs(k: String): Seq[String] = (j \ k) match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => Nil
    }
    val intervals: Seq[(Long, Long)] = ((j \ "intervals") match {
      case JArray(xs) => xs.collect { case JString(s) => s }
      case _ => str("interval").toList
    }).map { s =>
      val Array(a, b) = s.split("/")
      (java.time.Instant.parse(a).toEpochMilli, java.time.Instant.parse(b).toEpochMilli)
    }
    val filterJ = (j \ "filter") match {
      case JNothing | JNull => None
      case f => Some(f)
    }
    IngestionSpec(
      dataSource = str("dataSource").getOrElse(
        throw new IllegalArgumentException("dataSource missing")),
      intervals = intervals,
      dimensions = strs("dimensions"),
      metrics = strs("metrics"),
      granularity = Granularity.fromJson(j \ "granularity"),
      filter = filterJ.map(DimFilter.fromJson),
      filterJson = filterJ.map(f => JsonMethods.compact(JsonMethods.render(f))))
  }

  /** The windowed scan the reference's InputFormat performs for this
    * spec (timeline-resolved, interval-clipped, projected, filtered). */
  def scan(spark: org.apache.spark.sql.SparkSession, base: String,
           spec: IngestionSpec): org.apache.spark.sql.DataFrame = {
    require(spec.intervals.nonEmpty, "ingestion spec needs >= 1 interval")
    val frames = spec.intervals.map { case (lo, hi) =>
      graft.sources.SegmentStore.scan(spark, base, graft.sources.SegmentStore.ScanSpec(
        spec.dataSource, lo, hi, spec.dimensions, spec.metrics, spec.filterJson))
    }
    frames.reduce(_ unionByName _)
  }
}
