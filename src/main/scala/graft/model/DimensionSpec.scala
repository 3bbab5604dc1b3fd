package graft.model

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.json4s._

/** Druid `dimensionSpec`s: plain dimensions, or dimensions transformed
  * by an `extractionFn` (substring, regex capture, timeFormat on
  * __time, lower/upper, strlen, map lookup). Compiled to codegen'd
  * Columns; the output name follows Druid's `outputName`.
  *
  * (The reference exposes dimensions through its load spec —
  * druid-pig/PigSegmentLoadSpec.java:36 — and Druid queries refine them
  * with dimensionSpecs; same JSON dialect here.)
  */
object DimensionSpec {

  /** (base column name, output name, transform). The base name is kept
    * separate so callers can unnest multi-value base columns BEFORE the
    * extraction applies (Druid applies extractionFns per value). */
  final case class Dim(baseName: String, outputName: String, transform: Column => Column) {
    def column: Column = transform(col(baseName))
  }

  def fromJson(j: JValue, timeCol: String): Dim = j match {
    case JString(s) => Dim(s, s, identity)
    case obj: JObject =>
      def str(k: String): Option[String] = (obj \ k) match {
        case JString(v) => Some(v); case _ => None
      }
      val dimension = str("dimension").getOrElse(
        throw new IllegalArgumentException(s"dimensionSpec missing dimension: $j"))
      val outputName = str("outputName").getOrElse(dimension)
      val baseName = if (dimension == "__time") timeCol else dimension
      (obj \ "extractionFn") match {
        case JNothing | JNull => Dim(baseName, outputName, identity)
        case fn => Dim(baseName, outputName, c => applyExtraction(fn, c))
      }
    case x => throw new IllegalArgumentException(s"bad dimensionSpec $x")
  }

  def applyExtraction(j: JValue, c: Column): Column = j match {
    case obj: JObject =>
      def str(k: String): Option[String] = (obj \ k) match {
        case JString(v) => Some(v); case _ => None
      }
      def int(k: String): Option[Int] = (obj \ k) match {
        case JInt(v) => Some(v.toInt)
        case JLong(v) => Some(v.toInt)
        case _ => None
      }
      str("type").getOrElse(throw new IllegalArgumentException(s"extractionFn missing type: $j")) match {
        case "substring" =>
          // Druid index is 0-based; SQL substring is 1-based
          val from = int("index").getOrElse(0) + 1
          int("length") match {
            case Some(l) => substring(c, from, l)
            case None => c.substr(lit(from), length(c))
          }
        case "regex" =>
          val pattern = str("expr").getOrElse(
            throw new IllegalArgumentException("regex extractionFn needs expr"))
          val extracted = regexp_extract(c, pattern, 1)
          // Druid replaceMissingValue=false → non-matching keeps original
          (obj \ "replaceMissingValue") match {
            case JBool(true) =>
              when(extracted === "", (obj \ "replaceMissingValueWith") match {
                case JString(v) => lit(v)
                case _ => lit(null)
              }).otherwise(extracted)
            case _ => when(extracted === "", c).otherwise(extracted)
          }
        case "timeFormat" =>
          val fmt = str("format").getOrElse("yyyy-MM-dd'T'HH:mm:ss'Z'")
          date_format(c, fmt)
        case "lower" => lower(c)
        case "upper" => upper(c)
        case "strlen" => length(c).cast("string") // Druid strlen yields string dim
        case "lookup" =>
          val m = (obj \ "lookup" \ "map") match {
            case mo: JObject => mo.obj.collect { case (k, JString(v)) => (k, v) }
            case _ => Nil
          }
          val mapCol = map(m.flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
          val looked = element_at(mapCol, c)
          val retain = (obj \ "retainMissingValue") match {
            case JBool(b) => b
            case _ => false
          }
          if (retain) coalesce(looked, c)
          else (obj \ "replaceMissingValueWith") match {
            case JString(v) => coalesce(looked, lit(v))
            case _ => looked
          }
        case "cascade" =>
          (obj \ "extractionFns") match {
            case JArray(fns) => fns.foldLeft(c)((acc, fn) => applyExtraction(fn, acc))
            case _ => c
          }
        case other => throw new IllegalArgumentException(s"unsupported extractionFn $other")
      }
    case x => throw new IllegalArgumentException(s"bad extractionFn $x")
  }
}
