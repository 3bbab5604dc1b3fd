package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Druid query granularities re-expressed as Catalyst column transforms.
  *
  * The reference's reads are driven by a `DatasourceIngestionSpec` whose
  * `granularity` field (Druid `QueryGranularity`, see
  * reference druid-pig/PigSegmentLoadSpec.java:38-44) buckets the
  * `__time` column before rollup. Druid supports simple names
  * (`ALL`, `NONE`, `SECOND`..`YEAR`), fixed durations with an origin,
  * and ISO-8601 periods. All compile here to codegen'd expressions over
  * a timestamp column — no UDFs, so whole-stage codegen survives.
  */
sealed trait Granularity {
  /** Bucket a timestamp column to the start of its granule. */
  def bucket(ts: Column): Column
  /** DuckDB SQL equivalent over the expression `tsExpr` (oracle side). */
  def sql(tsExpr: String): String
  /** One-granule interval step (for empty-bucket grids); not defined
    * for ALL/NONE. */
  def step: Column = throw new UnsupportedOperationException(
    s"granularity $this has no fixed step")
}

object Granularity {

  /** No bucketing (Druid ALL collapses to a single group — callers use
    * an empty groupBy; NONE keeps the raw timestamp). */
  case object All extends Granularity {
    def bucket(ts: Column): Column = lit(null).cast("timestamp")
    def sql(tsExpr: String): String = "CAST(NULL AS TIMESTAMP)"
  }

  case object None_ extends Granularity {
    def bucket(ts: Column): Column = ts
    def sql(tsExpr: String): String = tsExpr
  }

  /** date_trunc-able calendar units (Druid simple granularities).
    * With a timeZone, buckets align to that zone's calendar (Druid
    * granularity timeZone field): shift in, truncate, shift back. */
  final case class Calendar(unit: String, timeZone: Option[String] = None) extends Granularity {
    override def step: Column = unit match {
      case "week" => expr("interval 7 day")
      case "quarter" => expr("interval 3 month")
      case u => expr(s"interval 1 $u")
    }
    def bucket(ts: Column): Column = timeZone match {
      case Some(tz) =>
        to_utc_timestamp(date_trunc(unit, from_utc_timestamp(ts, tz)), tz)
      case None => date_trunc(unit, ts)
    }
    def sql(tsExpr: String): String = timeZone match {
      case Some(tz) =>
        // DuckDB needs the ICU extension for timezones — unavailable
        // offline, so tz-granularities are spec-tested, not oracle'd
        throw new UnsupportedOperationException(
          s"no offline DuckDB oracle for tz-aware granularity ($tz)")
      case None => s"date_trunc('$unit', $tsExpr)"
    }
  }

  /** Fixed-duration buckets anchored at `originMillis` (Druid duration
    * granularity). pmod keeps floor semantics for pre-origin rows. */
  final case class Duration(millis: Long, originMillis: Long = 0L) extends Granularity {
    override def step: Column = expr(s"interval $millis millisecond")
    def bucket(ts: Column): Column = {
      val ms = unix_millis(ts)
      timestamp_millis(ms - pmod(ms - lit(originMillis), lit(millis)))
    }
    def sql(tsExpr: String): String = {
      val ms = s"epoch_ms($tsExpr)"
      s"make_timestamp((($ms - ((($ms - $originMillis) % $millis + $millis) % $millis)) * 1000))"
    }
  }

  private val simple: Map[String, Granularity] = Map(
    "ALL" -> All,
    "NONE" -> None_,
    "SECOND" -> Calendar("second"),
    "MINUTE" -> Calendar("minute"),
    "FIVE_MINUTE" -> Duration(5L * 60 * 1000),
    "TEN_MINUTE" -> Duration(10L * 60 * 1000),
    "FIFTEEN_MINUTE" -> Duration(15L * 60 * 1000),
    "THIRTY_MINUTE" -> Duration(30L * 60 * 1000),
    "HOUR" -> Calendar("hour"),
    "SIX_HOUR" -> Duration(6L * 3600 * 1000),
    "DAY" -> Calendar("day"),
    "WEEK" -> Calendar("week"),
    "MONTH" -> Calendar("month"),
    "QUARTER" -> Calendar("quarter"),
    "YEAR" -> Calendar("year"))

  /** Parse a granularity spec: a simple name, or
    * `{"type":"duration","duration":ms,"origin":iso}` /
    * `{"type":"period","period":"PT15M"}` (duration-expressible periods). */
  def fromString(name: String): Granularity =
    simple.getOrElse(name.toUpperCase, parsePeriod(name, 0L))

  def fromJson(j: org.json4s.JValue): Granularity = {
    import org.json4s._
    j match {
      case JString(s) => fromString(s)
      case JNothing | JNull => None_
      case obj: JObject =>
        val tpe = (obj \ "type") match { case JString(t) => t; case _ => "period" }
        val origin = (obj \ "origin") match {
          case JString(o) => java.time.Instant.parse(o).toEpochMilli
          case _ => 0L
        }
        val tz = (obj \ "timeZone") match {
          case JString(z) if z.nonEmpty && z != "UTC" => Some(z)
          case _ => None
        }
        tpe match {
          case "duration" =>
            val d = (obj \ "duration") match {
              case JInt(v) => v.toLong
              case JLong(v) => v
              case JString(v) => v.toLong
              case x => throw new IllegalArgumentException(s"bad duration $x")
            }
            Duration(d, origin)
          case "period" =>
            val p = (obj \ "period") match { case JString(v) => v; case x => throw new IllegalArgumentException(s"bad period $x") }
            parsePeriod(p, origin) match {
              case Calendar(u, None) if tz.isDefined => Calendar(u, tz)
              case g => g
            }
          case "all" => All
          case "none" => None_
          case other => fromString(other)
        }
      case x => throw new IllegalArgumentException(s"bad granularity $x")
    }
  }

  /** ISO-8601 periods that map to fixed durations (weeks/days/hours/
    * minutes/seconds) or to calendar units when unit-count is 1 and
    * unanchored. Calendar-varying multi-month periods are rejected. */
  private def parsePeriod(p: String, origin: Long): Granularity = p match {
    case "P1D" if origin == 0 => Calendar("day")
    case "P1W" if origin == 0 => Calendar("week")
    case "P1M" if origin == 0 => Calendar("month")
    case "P3M" if origin == 0 => Calendar("quarter")
    case "P1Y" if origin == 0 => Calendar("year")
    case "PT1H" if origin == 0 => Calendar("hour")
    case "PT1M" if origin == 0 => Calendar("minute")
    case "PT1S" if origin == 0 => Calendar("second")
    case weeks(n) => Duration(n.toLong * 7 * 86400000L, origin)
    case _ if p.startsWith("PT") || (p.startsWith("P") && p.contains("D")) =>
      Duration(java.time.Duration.parse(p).toMillis, origin)
    case _ =>
      throw new IllegalArgumentException(
        s"calendar-varying period $p with origin is not supported; use a simple name")
  }

  private val weeks = "P(\\d+)W".r
}
