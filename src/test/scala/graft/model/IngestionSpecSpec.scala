package graft.model

import graft.{SparkSpec, Tables}
import graft.sources.SegmentStore
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestionSpecSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("parses the reference's DatasourceIngestionSpec JSON dialect") {
    val spec = IngestionSpec.parse(
      """{
        |  "dataSource": "testDataSource",
        |  "interval": "1970-01-01T00:00:00.000Z/3000-01-01T00:00:00.000Z",
        |  "granularity": "NONE",
        |  "dimensions": ["host"],
        |  "metrics": ["visited_sum", "unique_hosts"],
        |  "filter": {"type": "selector", "dimension": "host", "value": "a.example.com"}
        |}""".stripMargin)
    assert(spec.dataSource == "testDataSource")
    assert(spec.intervals == Seq((0L, 32503680000000L)))
    assert(spec.dimensions == Seq("host"))
    assert(spec.metrics == Seq("visited_sum", "unique_hosts"))
    assert(spec.granularity == Granularity.None_)
    assert(spec.filter.contains(DimFilter.Selector("host", Some("a.example.com"))))
  }

  test("spec-driven scan equals programmatic scan") {
    val base = Files.createTempDirectory("graft_ispec_").toString
    val ev = Tables.events(spark, sf())
    SegmentStore.ingest(spark, ev, SegmentStore.IngestSpec(
      "ev", "ts", Seq("event_type"),
      """[{"type":"count","name":"cnt"}]""",
      Granularity.Calendar("hour"), Granularity.Calendar("day")), base, "v1")

    val out = IngestionSpec.scan(spark, base, IngestionSpec.parse(
      """{
        |  "dataSource": "ev",
        |  "interval": "2024-01-01T00:00:00Z/2024-02-01T00:00:00Z",
        |  "dimensions": ["event_type"],
        |  "metrics": ["cnt"],
        |  "filter": {"type": "selector", "dimension": "event_type", "value": "click"}
        |}""".stripMargin))
    val got = out.agg(sum($"cnt")).collect()(0).getLong(0)
    val want = ev.filter($"event_type" === "click").count()
    assert(got == want)
  }

  test("multi-interval specs union the windows") {
    val base = Files.createTempDirectory("graft_ispec2_").toString
    val ev = Tables.events(spark, sf())
    SegmentStore.ingest(spark, ev, SegmentStore.IngestSpec(
      "ev", "ts", Seq("event_type"),
      """[{"type":"count","name":"cnt"}]""",
      Granularity.Calendar("hour"), Granularity.Calendar("day")), base, "v1")

    val out = IngestionSpec.scan(spark, base, IngestionSpec.parse(
      """{
        |  "dataSource": "ev",
        |  "intervals": ["2024-01-02T00:00:00Z/2024-01-03T00:00:00Z",
        |                "2024-01-05T00:00:00Z/2024-01-06T00:00:00Z"],
        |  "dimensions": ["event_type"],
        |  "metrics": ["cnt"]
        |}""".stripMargin))
    val got = out.agg(sum($"cnt")).collect()(0).getLong(0)
    def dayCount(d: String): Long = {
      val t0 = java.time.Instant.parse(s"${d}T00:00:00Z").toEpochMilli
      ev.filter(unix_millis($"ts") >= t0 && unix_millis($"ts") < t0 + 86400000L).count()
    }
    assert(got == dayCount("2024-01-02") + dayCount("2024-01-05"))
  }
}
