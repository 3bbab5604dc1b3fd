package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Independent-truth gate for q_anomaly — the one round-8 query whose
  * driver gate passed with BOTH engines computing a wrong second
  * moment (the mirror replayed the engine's own formula, so the hash
  * gate certified cross-engine agreement, not truth). This fixture is
  * the structural defense: daily sums chosen so the TRUE rolling
  * mean, σ and z are known by hand construction, checked against the
  * statistics themselves — not against any replay of the engine's
  * decimal pipeline. A reintroduced moment bug (per-event squares,
  * wrong scaling, wrong window) fails here no matter what the mirror
  * says. */
class EventQueriesSpec extends SparkSpec {

  test("anomaly: hand-computed rolling z on a constructed fixture (true statistics, no replay)") {
    val s2 = spark
    import s2.implicits._
    // one event type, 9 days, TWO events per day (so the daily-sum
    // aggregation is exercised), daily sums:
    //   days 1..7 -> 10, day 8 -> 24, day 9 -> 10
    // truth by construction:
    //   day 7 window {10×7}:        mean = 10, σ = 0        -> z = 0
    //   day 8 window {10×6, 24}:    mean = 84/7 = 12
    //     Σx² = 6·100 + 576 = 1176; N = 7·1176 − 84² = 1176
    //     var = 1176/49 = 24, σ = √24; z = (24−12)/√24 = √6 ≈ 2.449 (anomaly)
    //   day 9 window {10×5, 24, 10}: same multiset as day 8 ⇒ same σ
    //     z = (10−12)/√24 ≈ −0.408 (not an anomaly)
    val split = Map(10.0 -> (4.0, 6.0), 24.0 -> (14.0, 10.0))
    val rows = (1 to 9).flatMap { day =>
      val total = if (day == 8) 24.0 else 10.0
      val (a, b) = split(total)
      Seq((day.toLong * 2, s"2024-01-0$day 03:00:00", 1L, "click", a, "{}"),
        (day.toLong * 2 + 1, s"2024-01-0$day 17:30:00", 2L, "click", b, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("anomfix").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val out = EventQueries.anomaly(spark, dir).collect()
      assert(out.length == 3) // days 7, 8, 9 (rolling window needs 7)
      val byDay = out.map(r => r.getAs[java.sql.Timestamp]("day").toString.take(10) ->
        (r.getAs[Double]("x"), r.getAs[Double]("mean7"), r.getAs[Double]("std7"),
          r.getAs[Double]("z"), r.getAs[Boolean]("is_anomaly"))).toMap
      def close(a: Double, b: Double): Boolean = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))

      val (x7, m7, s7, z7, a7) = byDay("2024-01-07")
      assert(x7 == 10.0 && m7 == 10.0 && s7 == 0.0 && z7 == 0.0 && !a7)

      val (x8, m8, s8, z8, a8) = byDay("2024-01-08")
      assert(x8 == 24.0 && m8 == 12.0)
      assert(close(s8, math.sqrt(24.0)), s"σ(day8)=$s8")
      assert(close(z8, math.sqrt(6.0)), s"z(day8)=$z8")
      assert(a8, "day 8 must flag: true z ≈ 2.449 > 2")

      val (x9, m9, s9, z9, a9) = byDay("2024-01-09")
      assert(x9 == 10.0 && m9 == 12.0)
      assert(close(s9, math.sqrt(24.0)))
      assert(close(z9, -2.0 / math.sqrt(24.0)), s"z(day9)=$z9")
      assert(!a9)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("anomaly: fractional values — the 10⁶ decimal scaling carries cents exactly") {
    val s2 = spark
    import s2.implicits._
    // daily sums: days 1..7 -> 0.25, day 8 -> 1.75 (halves per event)
    //   day 8 window {0.25×6, 1.75}: mean = 3.25/7; Σx = 3.25
    //     Σx² = 6·0.0625 + 3.0625 = 3.4375
    //     N = 7·3.4375 − 3.25² = 24.0625 − 10.5625 = 13.5
    //     var = 13.5/49, σ = √(13.5)/7; z = (1.75 − 3.25/7)/σ
    val rows = (1 to 8).flatMap { day =>
      val total = if (day == 8) 1.75 else 0.25
      Seq((day.toLong * 2, s"2024-01-0$day 03:00:00", 1L, "buy", total / 2, "{}"),
        (day.toLong * 2 + 1, s"2024-01-0$day 17:30:00", 2L, "buy", total / 2, "{}"))
    }
    val dir = java.nio.file.Files.createTempDirectory("anomfix2").toString
    rows.toDF("event_id", "ts_s", "user_id", "event_type", "value", "props")
      .withColumn("ts", to_timestamp(col("ts_s"))).drop("ts_s")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    try {
      val out = EventQueries.anomaly(spark, dir).collect()
      val day8 = out.find(_.getAs[java.sql.Timestamp]("day").toString.startsWith("2024-01-08")).get
      val trueMean = 3.25 / 7
      val trueSigma = math.sqrt(13.5) / 7
      val trueZ = (1.75 - trueMean) / trueSigma
      def close(a: Double, b: Double): Boolean = math.abs(a - b) <= 1e-9 * math.max(1.0, math.abs(b))
      assert(close(day8.getAs[Double]("mean7"), trueMean))
      assert(close(day8.getAs[Double]("std7"), trueSigma))
      assert(close(day8.getAs[Double]("z"), trueZ), s"z=$trueZ got ${day8.getAs[Double]("z")}")
      assert(day8.getAs[Boolean]("is_anomaly") == (math.abs(trueZ) > 2.0))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}
