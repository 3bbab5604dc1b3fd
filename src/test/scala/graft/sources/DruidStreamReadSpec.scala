package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.streaming.Trigger

class DruidStreamReadSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private val Day = 86400000L

  private def writeBatch(root: String, lo: Int, n: Int, version: String): Unit =
    (lo until lo + n).map(i => (Day * 10 + i, s"h$i", i.toLong))
      .toDF("__time", "host", "hits").coalesce(1)
      .write.format("druid-segments").mode("append")
      .option("dataSource", "ds").option("segmentGranularity", "DAY")
      .option("version", version).option("appendShards", "true").save(root)

  private def runTail(root: String, sink: String, ckpt: String): Unit =
    spark.readStream.format("druid-segments").load(root)
      .select($"__time", $"host", $"hits")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()

  test("streaming read tails published segments across restarts") {
    val base = Files.createTempDirectory("graft_tail_").toFile.getAbsolutePath
    val root = s"$base/deep"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    writeBatch(root, 0, 3, "rt0")
    runTail(root, sink, ckpt)
    val after1 = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(after1.toSeq == (0 until 3).map(i => (Day * 10 + i, s"h$i", i.toLong)))
    // two more publications (one appended shard, one NEW version) —
    // the restarted tail emits ONLY the new segments' rows
    writeBatch(root, 3, 2, "rt0")
    writeBatch(root, 5, 2, "rt1")
    runTail(root, sink, ckpt)
    val after2 = spark.read.parquet(sink)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sortBy(_._1)
    assert(after2.toSeq == (0 until 7).map(i => (Day * 10 + i, s"h$i", i.toLong)),
      "each published segment must stream exactly once across restarts")
  }

  test("streaming read applies pushed filters to new segments") {
    val base = Files.createTempDirectory("graft_tail_").toFile.getAbsolutePath
    val root = s"$base/deep"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    writeBatch(root, 0, 6, "rt0")
    spark.readStream.format("druid-segments").load(root)
      .where($"host" === "h2" && $"__time" >= Day * 10 + 1)
      .select($"__time", $"host", $"hits")
      .writeStream.format("parquet")
      .option("path", sink).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start().awaitTermination()
    val got = spark.read.parquet(sink).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq((Day * 10 + 2, "h2", 2L)))
  }
}
