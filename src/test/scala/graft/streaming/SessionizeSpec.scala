package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import java.sql.Timestamp

class SessionizeSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def ts(h: Int, m: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00")

  test("gap-based sessions close in-batch and by event-time timeout") {
    implicit val sql = spark.sqlContext
    val stream = MemoryStream[(Timestamp, Long, Double)]
    val df = stream.toDF().toDF("ts", "user_id", "value")
    val sessions = Sessionize.sessions(df, gapMs = 5 * 60 * 1000)

    // block 1: u1 two sessions (10:00+10:01 closed in-batch by the
    // 11:00 event), u2 one session at 10:30.
    stream.addData(
      (ts(10, 0), 1L, 1.0), (ts(10, 1), 1L, 2.0), (ts(11, 0), 1L, 4.0),
      (ts(10, 30), 2L, 8.0))
    // block 2: u3 at 12:00 pushes the watermark past every deadline —
    // u1's 11:00 and u2's 10:30 sessions close by event-time timeout.
    stream.addData((ts(12, 0), 3L, 16.0))

    sessions.writeStream
      .format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append)
      .trigger(Trigger.AvailableNow())
      .start().awaitTermination(120000)

    val got = spark.sql("SELECT * FROM sessions_out").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getDouble(4))).toSet
    assert(got == Set(
      (1L, ts(10, 0).getTime, 2L, 3.0),
      (1L, ts(11, 0).getTime, 1L, 4.0),
      (2L, ts(10, 30).getTime, 1L, 8.0)),
      "u3's 12:00 session stays open (no later watermark)")
  }

  test("batch sessionization agrees with the streaming gap semantics") {
    val df = Seq(
      (ts(10, 0), 1L), (ts(10, 1), 1L), (ts(11, 0), 1L),
      (ts(10, 30), 2L), (ts(12, 0), 3L)
    ).toDF("ts", "user_id")
    val got = Sessionize.batchSessions(df, "user_id", "ts", gapMs = 5 * 60 * 1000)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == Set(
      (1L, ts(10, 0).getTime, ts(10, 1).getTime, 2L),
      (1L, ts(11, 0).getTime, ts(11, 0).getTime, 1L),
      (2L, ts(10, 30).getTime, ts(10, 30).getTime, 1L),
      (3L, ts(12, 0).getTime, ts(12, 0).getTime, 1L))) // batch closes ALL sessions
  }
}
