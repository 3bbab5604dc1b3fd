package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class GranularitySpec extends SparkSpec {

  private def bucketOf(g: Granularity, iso: String): Timestamp = {
    val s = spark
    import s.implicits._
    Seq(iso).toDF("raw")
      .select(g.bucket(to_timestamp($"raw")).as("b"))
      .collect()(0).getTimestamp(0)
  }

  private def ts(iso: String) = Timestamp.valueOf(iso)

  test("calendar granularities truncate correctly") {
    assert(bucketOf(Granularity.fromString("HOUR"), "2024-03-05 13:47:31") == ts("2024-03-05 13:00:00"))
    assert(bucketOf(Granularity.fromString("DAY"), "2024-03-05 13:47:31") == ts("2024-03-05 00:00:00"))
    // ISO week starts Monday; 2024-03-05 is a Tuesday
    assert(bucketOf(Granularity.fromString("WEEK"), "2024-03-05 13:47:31") == ts("2024-03-04 00:00:00"))
    assert(bucketOf(Granularity.fromString("MONTH"), "2024-03-05 13:47:31") == ts("2024-03-01 00:00:00"))
    assert(bucketOf(Granularity.fromString("QUARTER"), "2024-05-05 13:47:31") == ts("2024-04-01 00:00:00"))
    assert(bucketOf(Granularity.fromString("YEAR"), "2024-03-05 13:47:31") == ts("2024-01-01 00:00:00"))
  }

  test("duration granularities bucket from epoch") {
    assert(bucketOf(Granularity.fromString("FIFTEEN_MINUTE"), "2024-03-05 13:47:31") == ts("2024-03-05 13:45:00"))
    assert(bucketOf(Granularity.fromString("SIX_HOUR"), "2024-03-05 13:47:31") == ts("2024-03-05 12:00:00"))
  }

  test("duration with origin shifts the grid") {
    // 10-minute buckets anchored at :07
    val g = Granularity.Duration(10L * 60 * 1000, originMillis = 7L * 60 * 1000)
    assert(bucketOf(g, "1970-01-01 00:20:00") == ts("1970-01-01 00:17:00"))
    // before origin still floors (pmod, not %)
    assert(bucketOf(g, "1970-01-01 00:05:00") == ts("1969-12-31 23:57:00"))
  }

  test("json forms parse") {
    import org.json4s.jackson.JsonMethods
    assert(Granularity.fromJson(JsonMethods.parse(""""day"""")) == Granularity.Calendar("day"))
    assert(Granularity.fromJson(JsonMethods.parse("""{"type":"duration","duration":60000}""")) ==
      Granularity.Duration(60000))
    assert(Granularity.fromJson(JsonMethods.parse("""{"type":"period","period":"PT15M"}""")) ==
      Granularity.Duration(15L * 60 * 1000))
    assert(Granularity.fromJson(JsonMethods.parse("""{"type":"period","period":"P2D"}""")) ==
      Granularity.Duration(2L * 86400000))
    assert(Granularity.fromJson(JsonMethods.parse("""{"type":"period","period":"P1W"}""")) ==
      Granularity.Calendar("week"))
    assert(Granularity.fromString("P1D") == Granularity.Calendar("day"))
  }

  test("timezone-aware calendar granularity shifts the bucket grid") {
    import org.json4s.jackson.JsonMethods
    // 2024-03-05 01:30 UTC is 2024-03-05 07:00 in +05:30 → that zone's
    // day starts 2024-03-04 18:30 UTC
    val g = Granularity.fromJson(JsonMethods.parse(
      """{"type":"period","period":"P1D","timeZone":"Asia/Kolkata"}"""))
    assert(g == Granularity.Calendar("day", Some("Asia/Kolkata")))
    assert(bucketOf(g, "2024-03-05 01:30:00") == ts("2024-03-04 18:30:00"))
    // UTC stays unchanged
    assert(Granularity.fromJson(JsonMethods.parse(
      """{"type":"period","period":"P1D","timeZone":"UTC"}""")) ==
      Granularity.Calendar("day"))
  }

  test("ALL produces a single group") {
    val g = Granularity.fromString("ALL")
    assert(g == Granularity.All)
  }
}
