package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

class StreamingDedupSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("streaming dedup emits each distinct text once within the horizon") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, String)]
    val df = stream.toDF().toDF("ts", "doc_id", "text")

    stream.addData(
      (ts(0), 1L, "alpha beta"), (ts(1), 2L, "gamma delta"),
      (ts(2), 3L, "alpha beta"), // dup of doc 1
      (ts(3), 4L, "epsilon"),
      (ts(4), 5L, "gamma delta")) // dup of doc 2

    val out = StreamingDedup.dropDuplicateTexts(df, "ts", "text", lateness = "10 minutes")
    val q = out.writeStream
      .format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)

    val texts = spark.table("dedup_out").select("text")
      .collect().map(_.getString(0)).sorted.toSeq
    assert(texts == Seq("alpha beta", "epsilon", "gamma delta"))
  }
}
