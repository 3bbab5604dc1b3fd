package graft.sources

import java.io.File
import java.nio.file.Files
import graft.SparkSpec
import DruidSegmentWriter._

class DruidSegmentsDataSourceSpec extends SparkSpec {

  private def tmpDir(): File = Files.createTempDirectory("druid-dsv2").toFile

  private val day = 24 * 3600 * 1000L
  private val t0 = java.time.Instant.parse("2020-06-01T00:00:00Z").toEpochMilli

  private def writeSegment(dir: File, version: String = "v1",
                           hosts: Seq[String] = Seq("a", "b", "c", "d", "e"),
                           intervalStart: Long = t0, intervalEnd: Long = t0 + day): Unit = {
    val n = hosts.size
    val times = (0 until n).map(i => intervalStart + i * ((intervalEnd - intervalStart) / n))
    DruidSegmentWriter.write(dir, "fixture", times,
      Seq(
        StrDim("host", hosts),
        LongMet("hits", (1 to n).map(_ * 10L))),
      intervalStart, intervalEnd, version = version)
  }

  test("dsv2: basic read + projection without __time + count(*)") {
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    assert(df.count() == 5)
    // projection that drops __time and reorders
    val got = df.select("hits", "host").orderBy("hits").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    assert(got == Seq((10L, "a"), (20L, "b"), (30L, "c"), (40L, "d"), (50L, "e")))
  }

  test("dsv2: __time and dictionary filter pushdown produce correct rows") {
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    writeSegment(new File(root, "seg2"), intervalStart = t0 + day, intervalEnd = t0 + 2 * day,
      hosts = Seq("f", "g", "h", "i", "j"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    import org.apache.spark.sql.functions.col
    // time filter hitting only seg2
    val r1 = df.where(col("__time") >= (t0 + day)).select("host").collect().map(_.getString(0)).toSet
    assert(r1 == Set("f", "g", "h", "i", "j"))
    // dictionary filter: host === "a" only in seg1
    DruidSegmentReader.decodedSegments.set(0)
    val r2 = df.where(col("host") === "a").select("host", "hits").collect()
    assert(r2.map(r => (r.getString(0), r.getLong(1))).toSeq == Seq(("a", 10L)))
    assert(DruidSegmentReader.decodedSegments.get() == 1, "dictionary skip should prune seg2")
    // unsatisfiable conjunction
    assert(df.where(col("host") === "a" && col("host") === "z").count() == 0)
    // __time equality
    assert(df.where(col("__time") === t0).count() == 1)
  }

  test("dsv2: overshadowing version wins") {
    val root = tmpDir()
    writeSegment(new File(root, "seg1"), version = "v1")
    writeSegment(new File(root, "seg2"), version = "v2", hosts = Seq("x", "y", "z", "w", "v"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    val hosts = df.select("host").collect().map(_.getString(0)).toSet
    assert(hosts == Set("x", "y", "z", "w", "v"))
  }

  test("dsv2: schema evolution — union schema, null-fill for absent columns") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir()
    // day 1: (host, hits); day 2 adds a `country` dim and drops `hits`
    writeSegment(new File(root, "seg1"))
    DruidSegmentWriter.write(new File(root, "seg2"), "fixture",
      (0 until 3).map(i => t0 + day + i * 1000L),
      Seq(StrDim("host", Seq("f", "g", "h")),
        StrDim("country", Seq("US", "DE", "JP")),
        LongMet("clicks", Seq(7L, 8L, 9L))),
      t0 + day, t0 + 2 * day, version = "v1")
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    val names = df.schema.fieldNames.toSet
    assert(names == Set("__time", "host", "country", "hits", "clicks"),
      s"union schema must cover both segments, got $names")
    // seg1 rows null-fill country/clicks; seg2 rows null-fill hits
    val rows = df.select("host", "country", "hits", "clicks").collect()
    assert(rows.length == 8)
    val d1 = rows.filter(r => Set("a", "b", "c", "d", "e")(r.getString(0)))
    assert(d1.forall(r => r.isNullAt(1) && !r.isNullAt(2) && r.isNullAt(3)))
    val d2 = rows.filter(r => Set("f", "g", "h")(r.getString(0)))
    assert(d2.length == 3 && d2.forall(r => !r.isNullAt(1) && r.isNullAt(2) && !r.isNullAt(3)))
    // equality on the evolved dim: a segment LACKING the column is
    // all-null for it and must skip decode entirely
    DruidSegmentReader.decodedSegments.set(0)
    val us = df.where(col("country") === "US").select("host").collect().map(_.getString(0))
    assert(us.toSeq == Seq("f"))
    assert(DruidSegmentReader.decodedSegments.get() == 1,
      "segment without the filtered column must short-circuit")
  }

  test("dsv2: __time bounds at Long.MaxValue don't wrap to an empty scan") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    assert(df.where(col("__time") <= Long.MaxValue).count() == 5)
    assert(df.where(col("__time") === Long.MaxValue).count() == 0)
    assert(df.where(col("__time") > Long.MaxValue).count() == 0)
    assert(df.where(col("__time") >= Long.MinValue).count() == 5)
  }

  test("bitmap index prunes row decode to filter selectivity") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir()
    val n = 200
    // 199 distinct hosts + one "rare" on the last row; SizePer=2 means
    // ~100 LZ4 chunks per column, so chunk decompressions measure how
    // much of the segment a filtered read actually decodes
    val hosts = (0 until n - 1).map(i => f"h$i%03d") :+ "rare"
    DruidSegmentWriter.write(new File(root, "seg1"), "fixture",
      (0 until n).map(i => t0 + i * 1000L),
      Seq(StrDim("host", hosts), LongMet("hits", (0 until n).map(_.toLong))),
      t0, t0 + day)
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    DruidSegmentReader.decompressedChunks.set(0)
    assert(df.collect().length == n)
    val fullChunks = DruidSegmentReader.decompressedChunks.get()
    DruidSegmentReader.decompressedChunks.set(0)
    val rare = df.where(col("host") === "rare").collect()
    assert(rare.length == 1)
    assert(rare.head.getAs[Long]("hits") == (n - 1).toLong)
    val prunedChunks = DruidSegmentReader.decompressedChunks.get()
    assert(prunedChunks > 0, "the one matching row still decodes")
    assert(prunedChunks * 10 <= fullChunks,
      s"bitmap-pruned decode must track selectivity: $prunedChunks chunks " +
        s"for 1/$n rows vs $fullChunks for the full scan")
    // multi-value dims: a row is in a value's bitmap when ANY of its
    // values matches (Druid's MV selector semantics)
    val mvDir = tmpDir()
    DruidSegmentWriter.write(new File(mvDir, "seg1"), "mv",
      Seq(t0, t0 + 1000L, t0 + 2000L),
      Seq(MvDim("tags", Seq(Seq("a", "b"), Seq("c"), Seq("b", "d")))),
      t0, t0 + day)
    val got = DruidSegmentReader.readWindowed(spark,
        Seq((new File(mvDir, "seg1").getAbsolutePath, Long.MinValue, Long.MaxValue)),
        Seq("tags"), Map("tags" -> Seq(graft.model.DictPred.Values(Set("b")))))
      .collect().map(_.getSeq[String](1).toSeq)
    assert(got.toSet == Set(Seq("a", "b"), Seq("b", "d")))
  }

  private def scanDescription(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.collectFirst {
      case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
        r.scan.description()
    }.getOrElse("")

  test("dsv2 aggregate pushdown: count(*) answers from segment metadata — zero chunks decompressed") {
    import org.apache.spark.sql.functions.{count, col}
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    writeSegment(new File(root, "seg2"), intervalStart = t0 + day, intervalEnd = t0 + 2 * day,
      hosts = Seq("f", "g", "h"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    val q = df.agg(count("*").as("n"))
    assert(scanDescription(q).contains("PushedAggregates: [COUNT(*)]"),
      s"plan must push the aggregate, got: ${scanDescription(q)}")
    DruidSegmentReader.decompressedChunks.set(0)
    DruidSegmentReader.decodedSegments.set(0)
    assert(q.collect().head.getLong(0) == 8L)
    assert(DruidSegmentReader.decodedSegments.get() == 0, "count(*) must not row-decode")
    assert(DruidSegmentReader.decompressedChunks.get() == 0,
      "full-coverage count reads only the supplier header — no chunk may decompress")
    // count over an exactly-pushed __time bound: clip path, still pushed
    val q2 = df.where(col("__time") >= t0 + day).agg(count("*").as("n"))
    assert(scanDescription(q2).contains("PushedAggregates: [COUNT(*)]"),
      s"time-bounded count must still push: ${scanDescription(q2)}")
    assert(q2.collect().head.getLong(0) == 3L)
    // an empty interval still yields 0, not null/no-rows
    val q3 = df.where(col("__time") >= t0 + 10 * day).agg(count("*"))
    assert(q3.collect().head.getLong(0) == 0L)
  }

  test("dsv2 aggregate pushdown: min/max(__time) decode only the time column") {
    import org.apache.spark.sql.functions.{max, min, count}
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    writeSegment(new File(root, "seg2"), intervalStart = t0 + day, intervalEnd = t0 + 2 * day,
      hosts = Seq("f", "g", "h"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    val q = df.agg(min("__time").as("lo"), max("__time").as("hi"), count("*").as("n"))
    val d = scanDescription(q)
    assert(d.contains("MIN(__time)") && d.contains("MAX(__time)") && d.contains("COUNT(*)"), d)
    DruidSegmentReader.decodedSegments.set(0)
    val r = q.collect().head
    assert(r.getLong(0) == t0)                       // first row of seg1
    assert(r.getLong(1) == t0 + day + 2 * (day / 3)) // last row of seg2
    assert(r.getLong(2) == 8L)
    assert(DruidSegmentReader.decodedSegments.get() == 0,
      "min/max(__time) must not decode dims/metrics")
  }

  test("dsv2 aggregate pushdown: declined for grouped/dim-filtered/other aggs — results stay correct") {
    import org.apache.spark.sql.functions.{count, sum, col}
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    // dictionary predicates prune approximately → residual Filter blocks pushdown
    val filtered = df.where(col("host") === "a").agg(count("*"))
    assert(!scanDescription(filtered).contains("PushedAggregates"), scanDescription(filtered))
    assert(filtered.collect().head.getLong(0) == 1L)
    // group-by: not pushed, correct via normal decode
    val grouped = df.groupBy("host").agg(count("*").as("n"))
    assert(!scanDescription(grouped).contains("PushedAggregates"), scanDescription(grouped))
    assert(grouped.collect().map(r => (r.getString(0), r.getLong(1))).toMap.values.forall(_ == 1L))
    // an unsupported agg in the mix declines the whole pushdown
    val mixed = df.agg(count("*"), sum("hits"))
    assert(!scanDescription(mixed).contains("PushedAggregates"), scanDescription(mixed))
    assert(mixed.collect().head.getLong(1) == 150L)
  }

  test("dsv2 aggregate pushdown: partial overshadow counts only timeline-visible rows") {
    import org.apache.spark.sql.functions.{count, max, min}
    val root = tmpDir()
    // v1 covers the whole day (5 rows, every day/5); v2 re-ingests only
    // the second half-day with 2 rows — visible = v1's first-half rows
    // (ts < t0+day/2: indices 0,1,2) + v2's 2 rows
    writeSegment(new File(root, "seg1"), version = "v1")
    DruidSegmentWriter.write(new File(root, "seg2"), "fixture",
      Seq(t0 + day / 2, t0 + day / 2 + 1000L),
      Seq(StrDim("host", Seq("x", "y")), LongMet("hits", Seq(1L, 2L))),
      t0 + day / 2, t0 + day, version = "v2")
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    val q = df.agg(count("*").as("n"), min("__time").as("lo"), max("__time").as("hi"))
    assert(scanDescription(q).contains("PushedAggregates"), scanDescription(q))
    val r = q.collect().head
    assert(r.getLong(0) == 5L, "3 visible v1 rows + 2 v2 rows")
    assert(r.getLong(1) == t0)
    assert(r.getLong(2) == t0 + day / 2 + 1000L)
    // cross-check against the non-agg (full row decode) path
    assert(df.collect().length == 5)
  }

  test("dsv2 limit pushdown: partial per-partition limit stops chunk decode early") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir()
    val n = 200
    DruidSegmentWriter.write(new File(root, "seg1"), "fixture",
      (0 until n).map(i => t0 + i * 1000L),
      Seq(StrDim("host", (0 until n).map(i => f"h$i%03d")),
        LongMet("hits", (0 until n).map(_.toLong))),
      t0, t0 + day)
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    DruidSegmentReader.decompressedChunks.set(0)
    assert(df.collect().length == n)
    val fullChunks = DruidSegmentReader.decompressedChunks.get()
    val limited = df.limit(3)
    assert(scanDescription(limited).contains("PushedLimit: 3"), scanDescription(limited))
    DruidSegmentReader.decompressedChunks.set(0)
    val got = limited.collect()
    assert(got.length == 3)
    assert(got.forall(r => r.getString(1).startsWith("h")))
    val limChunks = DruidSegmentReader.decompressedChunks.get()
    assert(limChunks * 10 <= fullChunks,
      s"limit(3) must stop decode early: $limChunks chunks vs $fullChunks full")
    // approximate dictionary predicates decline the limit (residual
    // filter could be starved by a truncated over-approximate stream)
    val guarded = df.where(col("host") === "h007").limit(1)
    assert(!scanDescription(guarded).contains("PushedLimit"), scanDescription(guarded))
    assert(guarded.collect().map(_.getString(1)).toSeq == Seq("h007"))
    // exact __time bounds + limit compose (both fully source-enforced)
    val timed = df.where(col("__time") >= t0 + 100_000L).limit(2)
    assert(scanDescription(timed).contains("PushedLimit: 2"), scanDescription(timed))
    val timedRows = timed.collect()
    assert(timedRows.length == 2 && timedRows.forall(_.getLong(0) >= t0 + 100_000L))
  }

  test("dsv2 topN pushdown: ORDER BY __time LIMIT n decodes only winning rows") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir()
    val n = 200
    DruidSegmentWriter.write(new File(root, "seg1"), "fixture",
      (0 until n).map(i => t0 + i * 1000L),
      Seq(StrDim("host", (0 until n).map(i => f"h$i%03d")),
        LongMet("hits", (0 until n).map(_.toLong))),
      t0, t0 + day)
    // second segment, later day — global top-n must merge across windows
    DruidSegmentWriter.write(new File(root, "seg2"), "fixture",
      (0 until 3).map(i => t0 + day + i * 1000L),
      Seq(StrDim("host", Seq("x", "y", "z")), LongMet("hits", Seq(1L, 2L, 3L))),
      t0 + day, t0 + 2 * day)
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    DruidSegmentReader.decompressedChunks.set(0)
    assert(df.collect().length == n + 3)
    val fullChunks = DruidSegmentReader.decompressedChunks.get()
    val latest = df.orderBy(col("__time").desc).limit(5)
    assert(scanDescription(latest).contains("PushedTopN: ORDER BY __time DESC LIMIT 5"),
      scanDescription(latest))
    DruidSegmentReader.decompressedChunks.set(0)
    val got = latest.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (t0 + day + 2000L, "z"), (t0 + day + 1000L, "y"), (t0 + day, "x"),
      (t0 + (n - 1) * 1000L, f"h${n - 1}%03d"), (t0 + (n - 2) * 1000L, f"h${n - 2}%03d")),
      s"got ${got.toSeq}")
    val topChunks = DruidSegmentReader.decompressedChunks.get()
    // the __time column scans fully (heap input) but dims decode only
    // for the <=5 winners per window
    assert(topChunks * 2 <= fullChunks,
      s"topN decode must skip losing rows' dims: $topChunks vs $fullChunks")
    // ascending works and respects an exactly-pushed time bound
    val first = df.where(col("__time") >= t0 + 10_000L)
      .orderBy(col("__time")).limit(2)
    assert(scanDescription(first).contains("PushedTopN: ORDER BY __time ASC LIMIT 2"),
      scanDescription(first))
    assert(first.collect().map(_.getLong(0)).toSeq ==
      Seq(t0 + 10_000L, t0 + 11_000L))
    // dictionary predicate → declined, still correct
    val guarded = df.where(col("host") === "h005").orderBy(col("__time")).limit(1)
    assert(!scanDescription(guarded).contains("PushedTopN"), scanDescription(guarded))
    assert(guarded.collect().map(_.getString(1)).toSeq == Seq("h005"))
    // ordering by a non-__time column → declined, correct via full sort
    val byHits = df.orderBy(col("hits").desc).limit(1)
    assert(!scanDescription(byHits).contains("PushedTopN"), scanDescription(byHits))
    assert(byHits.collect().head.getLong(2) == (n - 1).toLong)
  }

  test("writer rejects rows outside the declared interval (the aggregate fast-path contract)") {
    val root = tmpDir()
    intercept[IllegalArgumentException] {
      DruidSegmentWriter.write(new File(root, "bad"), "fixture",
        Seq(t0 - 1000L, t0), // first row precedes the interval
        Seq(StrDim("host", Seq("a", "b")), LongMet("hits", Seq(1L, 2L))),
        t0, t0 + day)
    }
  }

  test("dsv2: estimateStatistics reports real bytes, caches, and never reports 0 on failure") {
    val root = tmpDir()
    writeSegment(new File(root, "seg1"))
    val df = spark.read.format("druid-segments").load(root.getAbsolutePath)
    val stats = df.queryExecution.optimizedPlan.stats
    val zipLen = new File(new File(root, "seg1"), "index.zip").length()
    assert(stats.sizeInBytes == BigInt(zipLen),
      s"sizeInBytes ${stats.sizeInBytes} must equal index.zip bytes $zipLen")
  }
}
