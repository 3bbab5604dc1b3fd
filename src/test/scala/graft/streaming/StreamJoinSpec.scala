package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

class StreamJoinSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("interval join matches clicks to preceding views within the horizon") {
    implicit val sql = spark.sqlContext
    val vs = MemoryStream[(Long, Timestamp)]
    val cs = MemoryStream[(Long, Timestamp)]
    vs.addData((1L, ts(0)), (1L, ts(10)), (2L, ts(5)), (3L, ts(0)))
    cs.addData(
      (1L, ts(12)), // joins views @0 and @10
      (2L, ts(4)),  // click BEFORE the view — no match
      (2L, ts(40)), // > 30min horizon from view @5 — no match
      (3L, ts(30))) // exactly at the horizon — inclusive match

    val out = StreamJoin.intervalJoin(
      vs.toDF().toDF("user_id", "vts"), cs.toDF().toDF("user_id", "cts"),
      "user_id", "vts", "cts", horizon = "30 MINUTES", lateness = "2 hours")
    val q = out.writeStream.format("memory").queryName("sj_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)

    val got = spark.table("sj_out")
      .select("user_id", "vts", "cts").collect()
      .map(r => (r.getLong(0), r.getTimestamp(1), r.getTimestamp(2))).toSet
    assert(got == Set(
      (1L, ts(0), ts(12)), (1L, ts(10), ts(12)), (3L, ts(0), ts(30))))
  }
}
