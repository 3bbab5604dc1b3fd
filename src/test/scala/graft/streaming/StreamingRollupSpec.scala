package graft.streaming

import graft.SparkSpec
import graft.model.Granularity
import graft.sources.{SegmentCatalog, SegmentStore}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp

class StreamingRollupSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def ts(min: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:$sec%02d")

  private val spec = StreamingRollup.StreamSpec(
    dataSource = "stream_ev",
    timeCol = "ts",
    dimensions = Seq("event_type"),
    metricsJson =
      """[{"type":"count","name":"cnt"},
        |{"type":"longSum","name":"su","fieldName":"user_id"}]""".stripMargin,
    queryGranularity = "1 minute",
    segmentGranularity = Granularity.Calendar("hour"),
    lateness = "5 minutes")

  test("streaming rollup aggregates windows into the segment store") {
    val base = Files.createTempDirectory("graft_stream_").toString
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "event_type", "user_id")

    stream.addData(
      (ts(0, 10), "click", 1L), (ts(0, 40), "click", 2L),
      (ts(1, 5), "view", 3L), (ts(1, 50), "click", 4L))

    val rolled = StreamingRollup.rollup(df, spec)
    val q = StreamingRollup.toSegmentStore(spark, rolled, spec, base).start()
    q.awaitTermination(60000)

    val t0 = ts(0).getTime
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "stream_ev", t0, t0 + 3600000, Seq("event_type"), Seq("cnt", "su")))
      .orderBy("__time", "event_type").collect()
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (ts(0).getTime, "click", 2L, 3L),
      (ts(1).getTime, "click", 1L, 4L),
      (ts(1).getTime, "view", 1L, 3L)))
  }

  test("second batch updates re-publish windows as newer versions") {
    val base = Files.createTempDirectory("graft_stream_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "event_type", "user_id")
    val rolled = StreamingRollup.rollup(df, spec)

    stream.addData((ts(0, 10), "click", 1L))
    StreamingRollup.toSegmentStore(spark, rolled, spec, base, Some(ckpt))
      .start().awaitTermination(60000)

    // same window gets more data in a later batch → new version wins
    stream.addData((ts(0, 30), "click", 10L))
    StreamingRollup.toSegmentStore(spark, rolled, spec, base, Some(ckpt))
      .start().awaitTermination(60000)

    val versions = SegmentCatalog.read(base, "stream_ev").map(_.version).distinct.sorted
    assert(versions.size >= 2, s"expected multiple published versions, got $versions")

    val t0 = ts(0).getTime
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "stream_ev", t0, t0 + 3600000, Seq("event_type"), Seq("cnt", "su"))).collect()
    // latest version of the window: cumulative rollup (2 clicks, sum 11)
    assert(out.map(r => (r.getLong(2), r.getLong(3))).toSeq == Seq((2L, 11L)))
  }

  test("groups not re-emitted in a later batch survive its publication") {
    val base = Files.createTempDirectory("graft_stream_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "event_type", "user_id")
    val rolled = StreamingRollup.rollup(df, spec)

    // batch 1: two groups in the same hour chunk — (win 10:00, click)
    // and (win 10:01, view)
    stream.addData((ts(0, 10), "click", 1L), (ts(1, 20), "view", 2L))
    StreamingRollup.toSegmentStore(spark, rolled, spec, base, Some(ckpt))
      .start().awaitTermination(60000)

    // batch 2: only (win 10:02, click) changes — update mode emits just
    // that group; the whole-chunk publication must carry the others
    stream.addData((ts(2, 5), "click", 7L))
    StreamingRollup.toSegmentStore(spark, rolled, spec, base, Some(ckpt))
      .start().awaitTermination(60000)

    val t0 = ts(0).getTime
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "stream_ev", t0, t0 + 3600000, Seq("event_type"), Seq("cnt", "su")))
      .orderBy("__time", "event_type").collect()
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (ts(0).getTime, "click", 1L, 1L), // batch-1 group, not in batch 2
      (ts(1).getTime, "view", 1L, 2L),  // batch-1 group, not in batch 2
      (ts(2).getTime, "click", 1L, 7L)))
  }

  test("a batch updating an existing group replaces it, not duplicates it") {
    val base = Files.createTempDirectory("graft_stream_").toString
    val ckpt = Files.createTempDirectory("graft_ckpt_").toString
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, String, Long)]
    val df = stream.toDF().toDF("ts", "event_type", "user_id")
    val rolled = StreamingRollup.rollup(df, spec)

    stream.addData((ts(0, 10), "click", 1L), (ts(1, 20), "view", 2L))
    StreamingRollup.toSegmentStore(spark, rolled, spec, base, Some(ckpt))
      .start().awaitTermination(60000)

    // batch 2 updates the (10:00, click) group: carried-forward rows
    // must exclude the stale version of that key
    stream.addData((ts(0, 50), "click", 10L))
    StreamingRollup.toSegmentStore(spark, rolled, spec, base, Some(ckpt))
      .start().awaitTermination(60000)

    val t0 = ts(0).getTime
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "stream_ev", t0, t0 + 3600000, Seq("event_type"), Seq("cnt", "su")))
      .orderBy("__time", "event_type").collect()
    val got = out.map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq(
      (ts(0).getTime, "click", 2L, 11L), // updated cumulative rollup
      (ts(1).getTime, "view", 1L, 2L)))  // carried forward unchanged
  }
}
