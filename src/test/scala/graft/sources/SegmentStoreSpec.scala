package graft.sources

import graft.SparkSpec
import graft.model.Granularity
import org.apache.spark.sql.functions._
import java.nio.file.Files

class SegmentStoreSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def freshBase(): String =
    Files.createTempDirectory("graft_store_").toString

  private def eventsDf = graft.Tables.events(spark, sf())

  private val metricsJson =
    """[
      |{"type":"count","name":"cnt"},
      |{"type":"longSum","name":"su","fieldName":"user_id"},
      |{"type":"thetaSketch","name":"users_sk","fieldName":"user_id"}
      |]""".stripMargin

  private def specOf = SegmentStore.IngestSpec(
    dataSource = "ev",
    timeCol = "ts",
    dimensions = Seq("event_type"),
    metricsJson = metricsJson,
    queryGranularity = Granularity.Calendar("hour"),
    segmentGranularity = Granularity.Calendar("day"))

  test("catalog reader bridges a publisher's delayed rename window") {
    val base = freshBase()
    val seg = SegmentDescriptor("ev", 0L, 1000L, "v1", 0, 1, s"$base/seg")
    SegmentCatalog.publish(base, "ev", Seq(seg))
    // simulate mid-publish on a copy+delete store: target momentarily
    // gone, publisher's .tmp present; rename lands ~400 ms later
    val target = new java.io.File(SegmentCatalog.catalogPath(base, "ev"))
    val tmp = new java.io.File(target.getPath + ".tmp")
    assert(target.renameTo(tmp))
    val renamer = new Thread(() => { Thread.sleep(400); tmp.renameTo(target); () })
    renamer.start()
    try {
      val got = SegmentCatalog.read(base, "ev")
      assert(got == Seq(seg)) // reader waited out the window
    } finally renamer.join()
  }

  test("reading a never-published catalog returns Nil without stalling") {
    val base = freshBase()
    val t0 = System.nanoTime()
    assert(SegmentCatalog.read(base, "no_such_ds").isEmpty)
    // no .tmp in sight → no retry loop; generous bound for CI noise
    assert((System.nanoTime() - t0) < 2e9, "cold read must not back off")
  }

  test("ingest + scan roundtrip preserves rolled-up totals") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")

    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("cnt", "su")))

    val got = out.agg(sum($"cnt"), sum($"su")).collect()(0)
    val want = eventsDf.agg(count(lit(1)), sum($"user_id")).collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))
  }

  test("vacuum kills fully-overshadowed versions, keeps partially-visible ones") {
    import org.apache.spark.sql.functions._
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    val before = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", 0L, Long.MaxValue, Seq("event_type"), Seq("cnt", "su")))
      .agg(sum("cnt"), sum("su")).collect()(0)

    // v2 re-ingests ONE full day → exactly that v1 day-chunk is fully
    // overshadowed; v3 covers 6 hours of another day at HOUR chunks →
    // that v1 day-chunk is only PARTIALLY overshadowed and must survive
    val day1 = eventsDf.filter(col("ts") >= lit("2024-01-03") && col("ts") < lit("2024-01-04"))
    SegmentStore.ingest(spark, day1, specOf, base, version = "v2")
    val sixHours = eventsDf.filter(
      col("ts") >= lit("2024-01-05 06:00:00") && col("ts") < lit("2024-01-05 12:00:00"))
    SegmentStore.ingest(spark, sixHours,
      specOf.copy(segmentGranularity = Granularity.Calendar("hour")), base, version = "v3")

    val killed = SegmentStore.vacuum(base, "ev")
    assert(killed.map(_.version).distinct == Seq("v1"), s"killed: $killed")
    assert(killed.size == 1, "only the fully-overshadowed Jan-3 day chunk dies")
    assert(!new java.io.File(killed.head.path.stripPrefix("file:")).exists,
      "killed segment files must be deleted")

    // catalog no longer lists the killed segment; Jan-5's v1 chunk
    // (partially overshadowed by v3) survives
    val after = SegmentCatalog.read(base, "ev")
    assert(!after.exists(s => s.version == "v1" &&
      java.time.Instant.ofEpochMilli(s.startMs).toString.startsWith("2024-01-03")))
    assert(after.exists(s => s.version == "v1" &&
      java.time.Instant.ofEpochMilli(s.startMs).toString.startsWith("2024-01-05")))

    // the visible data is unchanged: v2 re-ingested the same day-3 rows
    // and v3 the same 6 h, so totals equal the pre-vacuum scan
    val got = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", 0L, Long.MaxValue, Seq("event_type"), Seq("cnt", "su")))
      .agg(sum("cnt"), sum("su")).collect()(0)
    assert(got == before)

    // idempotent: nothing left to kill
    assert(SegmentStore.vacuum(base, "ev").isEmpty)
  }

  test("segment files are written in Druid sort order (__time, dims)") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    // read ONE physical file with no sort in the plan: its rows must
    // already be (__time, event_type)-ordered (row-group pruning +
    // RLE depend on it)
    val files = new java.io.File(s"$base/ev/version=v1")
      .listFiles().filter(_.getName.startsWith("__chunk="))
      .flatMap(_.listFiles()).filter(_.getName.startsWith("__shard="))
      .flatMap(_.listFiles()).filter(_.getName.endsWith(".parquet"))
    assert(files.nonEmpty)
    val rows = spark.read.parquet(files.head.getAbsolutePath)
      .select("__time", "event_type").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(rows.length > 1)
    assert(rows.sameElements(rows.sortBy(identity)), "file not in (__time, dim) order")
  }

  test("multi-shard ingest publishes per-shard descriptors; scan unions all shards") {
    val base = freshBase()
    val descs = SegmentStore.ingest(spark, eventsDf,
      specOf.copy(dataSource = "ev4", numShards = 4), base, version = "v1")

    // per-(chunk, shard) descriptors, multiple shards actually used
    val byChunk = descs.groupBy(_.startMs)
    assert(byChunk.values.exists(_.size > 1), "expected >1 shard per chunk")
    assert(descs.forall(_.numShards == 4))
    assert(descs.map(_.shardNum).distinct.sorted.forall(s => s >= 0 && s < 4))
    // each shard path is a distinct directory
    assert(descs.map(_.path).distinct.size == descs.size)

    // same dim value never splits across shards within a chunk
    // (hash-sharded by dims) — and totals survive the union
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev4", t0, t1, Seq("event_type"), Seq("cnt", "su")))
    val got = out.agg(sum($"cnt"), sum($"su")).collect()(0)
    val want = eventsDf.agg(count(lit(1)), sum($"user_id")).collect()(0)
    assert(got.getLong(0) == want.getLong(0))
    assert(got.getLong(1) == want.getLong(1))

    // timeline: all 4 shards of the winning version are visible
    val segs = SegmentCatalog.read(base, "ev4")
    val windows = VersionedTimeline.resolve(segs, t0, t1)
    val firstChunk = windows.filter(_.segment.startMs == windows.map(_.segment.startMs).min)
    assert(firstChunk.map(_.segment.shardNum).distinct.size == firstChunk.size)
  }

  test("rollup=false ingests detail rows: duplicates preserved, agg at query time") {
    val base = freshBase()
    // two IDENTICAL rows — rollup would collapse them; detail must not
    val df = Seq(
      ("2024-01-01 10:00:00", "click", 7L),
      ("2024-01-01 10:00:00", "click", 7L),
      ("2024-01-01 11:00:00", "view", 9L)
    ).toDF("ts", "event_type", "user_id")
      .withColumn("ts", to_timestamp($"ts"))
    SegmentStore.ingest(spark, df,
      SegmentStore.IngestSpec(
        dataSource = "detail", timeCol = "ts", dimensions = Seq("event_type"),
        metricsJson = """[{"type":"count","name":"cnt"},
                         |{"type":"longSum","name":"su","fieldName":"user_id"}]""".stripMargin,
        queryGranularity = graft.model.Granularity.None_,
        segmentGranularity = graft.model.Granularity.Calendar("day"),
        rollup = false),
      base, version = "v1")

    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "detail", t0, t0 + 86400000L, Seq("event_type"), Seq("cnt", "su")))
    assert(out.count() == 3, "detail ingest must keep duplicate rows")
    // query-time re-aggregation over the detail rows
    val agg = out.groupBy($"event_type")
      .agg(sum($"cnt").as("cnt"), sum($"su").as("su"))
      .orderBy("event_type").collect()
    assert(agg.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("click", 2L, 14L), ("view", 1L, 9L)))
  }

  test("re-ingesting the same version is idempotent (no double counting)") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    // a retried ingest of the identical version must replace, not append
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")

    val segs = SegmentCatalog.read(base, "ev")
    assert(segs.map(s => (s.version, s.startMs, s.shardNum)).distinct.size == segs.size,
      "duplicate descriptors in catalog")

    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli
    val got = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("cnt", "su")))
      .agg(sum($"cnt")).collect()(0).getLong(0)
    val want = eventsDf.count()
    assert(got == want, s"scan counted $got rows, raw has $want")
  }

  test("interval scan prunes to requested window") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    val t0 = java.time.Instant.parse("2024-01-03T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-01-05T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("cnt")))
    val got = out.agg(sum($"cnt")).collect()(0).getLong(0)
    val want = eventsDf.filter(unix_millis($"ts") >= t0 && unix_millis($"ts") < t1).count()
    assert(got == want)
  }

  test("newer version overshadows; partial overshadow keeps old rows outside window") {
    val base = freshBase()
    // v1: all data; v2: Jan-04 only, with user_id shifted by +1000 to detect origin
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    val day0 = java.time.Instant.parse("2024-01-04T00:00:00Z").toEpochMilli
    val day1 = day0 + 86400000L
    val patched = eventsDf
      .filter(unix_millis($"ts") >= day0 && unix_millis($"ts") < day1)
      .withColumn("user_id", $"user_id" + 1000)
    SegmentStore.ingest(spark, patched, specOf, base, version = "v2")

    val t0 = java.time.Instant.parse("2024-01-03T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-01-06T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("su", "cnt")))

    val gotSum = out.agg(sum($"su")).collect()(0).getLong(0)
    val raw = eventsDf.filter(unix_millis($"ts") >= t0 && unix_millis($"ts") < t1)
    val wantSum = raw.agg(sum($"user_id")).collect()(0).getLong(0) +
      1000L * raw.filter(unix_millis($"ts") >= day0 && unix_millis($"ts") < day1).count()
    assert(gotSum == wantSum, "patched day contributes v2 rows, other days v1")
  }

  test("sketch metrics re-aggregate from stored bytes (exact below k)") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("users_sk")))
    val est = out.agg(
      graft.functions.Sketches.theta_estimate(
        graft.functions.Sketches.theta_sketch_agg($"users_sk")).as("e"))
      .collect()(0).getDouble(0)
    val exact = eventsDf.select($"user_id").distinct().count().toDouble
    assert(est == exact, s"theta re-agg $est vs exact $exact")
  }

  test("compaction: hourly segments re-publish as daily, totals and sketches preserved") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli

    SegmentStore.compact(spark, base, "ev", t0, t1,
      dimensions = Seq("event_type"),
      metricsJson = metricsJson,
      queryGranularity = Granularity.Calendar("day"),
      segmentGranularity = Granularity.Calendar("week"),
      version = "v2-compacted")

    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("cnt", "su", "users_sk")))
    // compacted rows are daily — strictly fewer than hourly rollups
    assert(out.count() < eventsDf.count())
    val got = out.agg(sum($"cnt"), sum($"su")).collect()(0)
    val want = eventsDf.agg(count(lit(1)), sum($"user_id")).collect()(0)
    assert(got.getLong(0) == want.getLong(0), "counts survive compaction")
    assert(got.getLong(1) == want.getLong(1), "sums survive compaction")
    val est = out.agg(
      graft.functions.Sketches.theta_estimate(
        graft.functions.Sketches.theta_sketch_agg($"users_sk")).as("e"))
      .collect()(0).getDouble(0)
    val exact = eventsDf.select($"user_id").distinct().count().toDouble
    assert(est == exact, "sketch bytes survive compaction")
  }

  test("filter JSON applies on scan") {
    val base = freshBase()
    SegmentStore.ingest(spark, eventsDf, specOf, base, version = "v1")
    val t0 = java.time.Instant.parse("2024-01-01T00:00:00Z").toEpochMilli
    val t1 = java.time.Instant.parse("2024-02-01T00:00:00Z").toEpochMilli
    val out = SegmentStore.scan(spark, base, SegmentStore.ScanSpec(
      "ev", t0, t1, Seq("event_type"), Seq("cnt"),
      filterJson = Some("""{"type":"selector","dimension":"event_type","value":"purchase"}""")))
    val got = out.agg(sum($"cnt")).collect()(0).getLong(0)
    val want = eventsDf.filter($"event_type" === "purchase").count()
    assert(got == want)
  }
}
