package graft.sources

import java.io.File
import java.nio.file.Files
import graft.SparkSpec
import DruidSegmentWriter._

class TmpReviewDsv2Spec extends SparkSpec {

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
}
