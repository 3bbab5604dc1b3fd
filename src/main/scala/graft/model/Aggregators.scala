package graft.model

import graft.queries.Exact
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, StructType}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Druid `AggregatorFactory` / `PostAggregator` JSON specs compiled to
  * Spark aggregate / projection `Column`s.
  *
  * This is the Spark-native re-expression of the reference's Pig UDF
  * adapters (druid-pig/udfs/AggregatorFactoryAdapter.java:43-119,
  * PostAggregatorAdapter.java): where the reference re-runs Druid
  * `BufferAggregator`s over Pig bags, we compile the same JSON dialect
  * to Catalyst aggregates. Numeric aggs are Spark built-ins (codegen'd,
  * whole-stage); the sketch aggs (theta/KLL) are
  * TypedImperativeAggregate — not codegen'd, but still partial-
  * aggregating, so only sketch bytes cross the shuffle.
  *
  * Finalizing vs non-finalizing (reference
  * …FinalizingAggregatorFactoryAdapter vs NonFinalizing…): sketch aggs
  * either produce mergeable intermediate bytes (`finalize=false`, for
  * multi-level re-aggregation — Spark `hll_union_agg` consumes them) or
  * a finalized numeric estimate (`finalize=true`).
  *
  * Double sums go through decimal-exact summation (Exact.dsum) — sums
  * are then independent of partition/addition order, which both makes
  * results reproducible run-to-run at cluster scale and lets the
  * correctness oracle hash-match bit-for-bit.
  */
object Aggregators {

  final case class AggSpec(
      name: String, tpe: String, fieldName: String,
      fields: Seq[String], filter: Option[DimFilter], sub: Option[AggSpec],
      lgK: Int = 12, size: Int = 4096, k: Int = 128, byRow: Boolean = true,
      metricColumns: Seq[String] = Nil,
      lower: Double = 0.0, upper: Double = 0.0, numBuckets: Int = 10,
      outlierMode: String = "overflow")

  def parseAggs(json: String): Seq[AggSpec] =
    JsonMethods.parse(json) match {
      case JArray(xs) => xs.map(aggFromJson)
      case obj: JObject => Seq(aggFromJson(obj))
      case x => throw new IllegalArgumentException(s"bad aggregations $x")
    }

  def aggFromJson(j: JValue): AggSpec = j match {
    case obj: JObject =>
      def str(k: String): Option[String] = (obj \ k) match {
        case JString(s) => Some(s); case _ => None
      }
      val tpe = str("type").getOrElse(throw new IllegalArgumentException(s"agg missing type: $j"))
      val fields = (obj \ "fields") match {
        case JArray(xs) => xs.collect { case JString(s) => s }
        case _ => Nil
      }
      val lgK = (obj \ "lgK") match {
        case JInt(v) => v.toInt
        case _ => 12
      }
      val k = (obj \ "k") match { // quantilesDoublesSketch size
        case JInt(v) => v.toInt
        case _ => 128 // Druid's default k
      }
      val size = (obj \ "size") match { // theta/tuple nominal entries
        case JInt(v) => v.toInt
        case _ => (obj \ "nominalEntries") match {
          case JInt(v) => v.toInt
          case _ => 4096
        }
      }
      val filter = (obj \ "filter") match {
        case JNothing | JNull => None
        case f => Some(DimFilter.fromJson(f))
      }
      val sub = (obj \ "aggregator") match {
        case JNothing | JNull => None
        case a => Some(aggFromJson(a))
      }
      def dbl(key: String, default: Double): Double = (obj \ key) match {
        case JDouble(v) => v; case JInt(v) => v.toDouble; case _ => default
      }
      AggSpec(
        name = str("name").getOrElse(sub.map(_.name).getOrElse("agg")),
        tpe = tpe,
        fieldName = str("fieldName").getOrElse(""),
        fields = fields, filter = filter, sub = sub, lgK = lgK, size = size, k = k,
        byRow = (obj \ "byRow") match { case JBool(b) => b; case _ => true },
        metricColumns = (obj \ "metricColumns") match {
          case JArray(xs) => xs.collect { case JString(s) => s }
          case _ => Nil
        },
        lower = dbl("lowerLimit", 0.0), upper = dbl("upperLimit", 0.0),
        numBuckets = (obj \ "numBuckets") match {
          case JInt(v) => v.toInt; case _ => 10
        },
        outlierMode = str("outlierHandlingMode").getOrElse("overflow"))
    case x => throw new IllegalArgumentException(s"bad aggregator $x")
  }

  /** Injective string encoding of a dim tuple: each field is
    * length-prefixed (`<len>:<value>`), NULL encodes as `"N"` — which
    * cannot collide with a length prefix since those start with a
    * digit. Unlike concat_ws, NULL fields are preserved positionally,
    * so (NULL,"a") ≠ ("a",NULL) ≠ ("a"). */
  private def tupleKey(fields: Seq[String]): Column = {
    val parts = fields.map { fn =>
      val s = col(fn).cast("string")
      when(s.isNull, lit("N")).otherwise(concat(length(s).cast("string"), lit(":"), s))
    }
    concat(parts: _*)
  }

  /** Compile one aggregator spec to an aggregate Column.
    *
    * @param timeCol  the __time column name (for first/last)
    * @param finalize finalize sketches to estimates (vs mergeable bytes)
    */
  def compile(spec: AggSpec, schema: StructType, timeCol: String = "__time",
              finalize: Boolean = true): Column =
    compileGuarded(spec, schema, timeCol, finalize, cond = None)

  /** Compile with an optional row guard (the `filtered` aggregator's
    * condition). Instead of a per-type whitelist of filterable
    * sub-aggregators (the reference adapts ANY AggregatorFactory —
    * druid-pig/udfs/AggregatorFactoryAdapter.java:43-119), the guard is
    * woven into each aggregator's inputs: non-matching rows contribute
    * NULL, and every aggregate here — sums, min/max, min_by/max_by via
    * a guarded ordering key, HLL/theta/KLL sketch builds — skips NULL
    * inputs. Nested `filtered` specs AND their conditions. */
  private def compileGuarded(spec: AggSpec, schema: StructType, timeCol: String,
                             finalize: Boolean, cond: Option[Column]): Column = {
    def guard(c: Column): Column = cond.map(when(_, c)).getOrElse(c)
    def f: Column = guard(col(spec.fieldName))
    // first/last: guard the ORDERING key — min_by/max_by ignore rows
    // whose ordering key is NULL, so non-matching rows never win.
    // The key is (time, value), NOT time alone: Druid leaves equal-time
    // first/last unspecified (segment order), which breaks determinism
    // the moment the data carries duplicate timestamps (observed on the
    // scaled sf1 events table — every row has copies×identical ts).
    // Struct ordering is lexicographic in both engines, so ties on time
    // break on the value itself: first = smallest value at the earliest
    // time, last = largest value at the latest time, total order, same
    // answer under any partitioning. NULL-valued rows get a NULL key
    // (not a (ts, null) struct, which would WIN first-ties under
    // nulls-first struct ordering): they are skipped entirely, matching
    // Druid's null handling and the SQL mirror's min/max FILTER.
    def t(v: Column): Column = guard(when(v.isNotNull, struct(col(timeCol), v)))
    val c: Column = spec.tpe match {
      case "count" => count(guard(lit(1)))
      case "longSum" => coalesce(sum(f.cast("long")), lit(0L))
      case "doubleSum" | "floatSum" => coalesce(Exact.dsum(f), lit(0.0))
      case "longMin" => min(f.cast("long"))
      case "longMax" => max(f.cast("long"))
      case "doubleMin" | "floatMin" => min(f.cast("double"))
      case "doubleMax" | "floatMax" => max(f.cast("double"))
      case "longFirst" => min_by(f.cast("long"), t(col(spec.fieldName).cast("long")))
      case "longLast" => max_by(f.cast("long"), t(col(spec.fieldName).cast("long")))
      case "doubleFirst" | "floatFirst" =>
        min_by(f.cast("double"), t(col(spec.fieldName).cast("double")))
      case "doubleLast" | "floatLast" =>
        max_by(f.cast("double"), t(col(spec.fieldName).cast("double")))
      case "stringFirst" => min_by(f.cast("string"), t(col(spec.fieldName).cast("string")))
      case "stringLast" => max_by(f.cast("string"), t(col(spec.fieldName).cast("string")))
      case "hyperUnique" =>
        // over a sketch column (segment metric) → merge; over raw → build
        val isSketchCol = schema.fields.exists(x => x.name == spec.fieldName &&
          x.dataType == BinaryType)
        val sketch = if (isSketchCol) hll_union_agg(f) else hll_sketch_agg(f, lit(spec.lgK))
        if (finalize) hll_sketch_estimate(sketch).cast("double") else sketch
      case "cardinality" =>
        // byRow=true (Druid default): distinct dim TUPLES. The tuple
        // key is length-prefixed per field so ("ab","c") ≠ ("a","bc")
        // and no separator-in-value collision is possible; NULL encodes
        // as a sentinel that cannot collide with a length prefix
        // (non-null fields always start with a digit). concat (not
        // concat_ws) so NULL fields are never silently skipped.
        // byRow=false: distinct VALUES across the union of the listed
        // dims — one HLL per field, merged with hll_union, which is
        // exactly the value-union semantics and stays one-pass and
        // mergeable (partial agg + re-agg both work). Non-null scalar
        // values only, matching Druid's SQL-compatible null handling.
        val sketch =
          if (spec.byRow) hll_sketch_agg(guard(tupleKey(spec.fields)), lit(spec.lgK))
          else spec.fields
            .map(fn => hll_sketch_agg(guard(col(fn).cast("string")), lit(spec.lgK)))
            .reduceLeft(hll_union(_, _))
        if (finalize) hll_sketch_estimate(sketch).cast("double") else sketch
      case "thetaSketch" =>
        val sketch = graft.functions.Sketches.theta_sketch_agg(f, spec.size)
        if (finalize) graft.functions.Sketches.theta_estimate(sketch) else sketch
      case "quantilesDoublesSketch" | "approxHistogramFold" =>
        // mergeable KLL sketch bytes; finalized form = median (further
        // quantiles via the quantilesDoublesSketchToQuantile post-agg)
        val sketch = graft.functions.KllSketch.kll_sketch_agg(f, spec.k)
        if (finalize) graft.functions.KllSketch.kll_quantile(sketch, lit(0.5)) else sketch
      case "arrayOfDoublesSketch" =>
        // tuple sketch: distinct keys + per-key-summed double metrics.
        // Over a BinaryType column (segment metric) → merge; over raw
        // rows → build from the key + metricColumns (guard only the
        // key: a filtered row's NULL key skips the whole row).
        val isSketchCol = schema.fields.exists(x => x.name == spec.fieldName &&
          x.dataType == BinaryType)
        val m = math.max(spec.metricColumns.size, 1)
        val sketch =
          if (isSketchCol) graft.functions.TupleSketch.tuple_merge_agg(f, m, spec.size)
          else graft.functions.TupleSketch.tuple_sketch_agg(
            guard(col(spec.fieldName)),
            if (spec.metricColumns.nonEmpty) spec.metricColumns.map(col)
            else Seq(lit(1.0)),
            spec.size)
        if (finalize) graft.functions.TupleSketch.tuple_estimate(sketch) else sketch
      case "fixedBucketsHistogram" =>
        // deterministic equal-width histogram (Druid histogram
        // extension): struct<buckets: array<long>, lower_out, upper_out>.
        // Pure codegen'd conditional sums — partial aggregation applies,
        // a group ships numBuckets+2 longs regardless of row count. The
        // bucket arithmetic (subtract, divide, floor) is exactly-rounded
        // IEEE both engines, so an oracle can replay it bit-for-bit.
        // Druid semantics: v == upperLimit lands in the last bucket;
        // outliers per mode (ignore drops, overflow counts separately,
        // clip pushes into the edge buckets). NULLs are skipped.
        require(spec.upper > spec.lower && spec.numBuckets > 0,
          s"fixedBucketsHistogram needs lowerLimit < upperLimit, got ${spec.lower}..${spec.upper}")
        val v = f.cast("double")
        val width = (spec.upper - spec.lower) / spec.numBuckets
        val lastB = spec.numBuckets - 1
        val idxRaw = floor((v - lit(spec.lower)) / lit(width)).cast("int")
        val inLow = v < lit(spec.lower)
        val inHigh = v > lit(spec.upper)
        val bucketIdx = when(v === lit(spec.upper), lit(lastB)).otherwise(idxRaw)
        val effIdx = spec.outlierMode match {
          case "clip" =>
            when(inLow, lit(0)).when(inHigh, lit(lastB)).otherwise(bucketIdx)
          case "ignore" | "overflow" =>
            when(inLow || inHigh, lit(null)).otherwise(bucketIdx)
          case other =>
            throw new IllegalArgumentException(s"bad outlierHandlingMode $other")
        }
        val counts = array((0 until spec.numBuckets).map(b =>
          coalesce(sum(when(effIdx === b, 1L)), lit(0L))): _*)
        def outCount(c: Column): Column =
          if (spec.outlierMode == "overflow") coalesce(sum(when(c, 1L)), lit(0L))
          else lit(0L)
        struct(counts.as("buckets"),
          outCount(inLow).as("lower_out"), outCount(inHigh).as("upper_out"))
      case "filtered" =>
        val sub = spec.sub.getOrElse(throw new IllegalArgumentException("filtered agg needs aggregator"))
        val subCond = spec.filter.getOrElse(DimFilter.True).compile(schema)
        val combined = cond.map(_ && subCond).getOrElse(subCond)
        // strip the alias compileGuarded adds for the sub spec; the
        // outer spec's name wins (Druid: filtered agg's name is its own)
        return compileGuarded(sub, schema, timeCol, finalize, Some(combined)).as(spec.name)
      case other => throw new IllegalArgumentException(s"unsupported aggregator type $other")
    }
    c.as(spec.name)
  }

  /** Metric spec for re-aggregating already-rolled partials: counts
    * re-sum, sums/min/max/sketch-merges keep their type, field = name
    * (used by streaming handoff and segment compaction). */
  def reaggSpec(metricsJson: String): String = {
    val reagg = JsonMethods.parse(metricsJson) match {
      case JArray(xs) => JArray(xs.map {
        case o: JObject =>
          val name = (o \ "name") match { case JString(s) => s; case _ => "agg" }
          val tpe = (o \ "type") match { case JString(s) => s; case _ => "" }
          val newTpe = tpe match {
            case "count" => "longSum"
            case t => t
          }
          JObject("type" -> JString(newTpe), "name" -> JString(name),
            "fieldName" -> JString(name))
        case x => x
      })
      case x => x
    }
    JsonMethods.compact(JsonMethods.render(reagg))
  }

  // ---- post-aggregators ----

  def parsePostAggs(json: String): Seq[JValue] =
    JsonMethods.parse(json) match {
      case JArray(xs) => xs
      case obj: JObject => Seq(obj)
      case x => throw new IllegalArgumentException(s"bad postAggregations $x")
    }

  /** Compile a Druid post-aggregator to a projection Column over the
    * aggregated result (agg outputs referenced by name). */
  def compilePostAgg(j: JValue): Column = j match {
    case obj: JObject =>
      def str(k: String): Option[String] = (obj \ k) match {
        case JString(s) => Some(s); case _ => None
      }
      val named: Column = str("type").get match {
        case "fieldAccess" | "finalizingFieldAccess" => col(str("fieldName").get)
        case "constant" => (obj \ "value") match {
          case JInt(v) => lit(v.toLong)
          case JLong(v) => lit(v)
          case JDouble(v) => lit(v)
          case JDecimal(v) => lit(v.toDouble)
          case x => throw new IllegalArgumentException(s"bad constant $x")
        }
        case "arithmetic" =>
          val fields = (obj \ "fields") match {
            case JArray(xs) => xs.map(compilePostAgg)
            case _ => Nil
          }
          val fn = str("fn").get
          fields.reduce { (a, b) =>
            fn match {
              case "+" => a + b
              case "-" => a - b
              case "*" => a * b
              case "/" => when(b === 0, lit(0.0)).otherwise(a / b) // Druid / is 0-safe
              case "quotient" => a / b
              case other => throw new IllegalArgumentException(s"bad fn $other")
            }
          }
        case "expression" =>
          // Druid's expression post-aggregator; like virtualColumns,
          // the expression text is Spark SQL's dialect (documented
          // deviation — the shared arithmetic/function subset is
          // spelled identically), referencing agg outputs by name
          expr(str("expression").get)
        case "hyperUniqueCardinality" =>
          val f = col(str("fieldName").get)
          // over sketch bytes → estimate (double, Druid semantics)
          hll_sketch_estimate(f).cast("double")
        case "thetaSketchEstimate" =>
          graft.functions.Sketches.theta_estimate(compilePostAgg(obj \ "field"))
        case "arrayOfDoublesSketchToEstimate" =>
          graft.functions.TupleSketch.tuple_estimate(compilePostAgg(obj \ "field"))
        case "arrayOfDoublesSketchToMetricsSumEstimate" =>
          graft.functions.TupleSketch.tuple_metric_sums(compilePostAgg(obj \ "field"))
        case "arrayOfDoublesSketchToMeans" =>
          graft.functions.TupleSketch.tuple_metric_means(compilePostAgg(obj \ "field"))
        case "quantilesDoublesSketchToQuantile" =>
          val fraction = (obj \ "fraction") match {
            case JDouble(v) => v
            case JInt(v) => v.toDouble
            case x => throw new IllegalArgumentException(s"bad fraction $x")
          }
          graft.functions.KllSketch.kll_quantile(
            compilePostAgg(obj \ "field"), lit(fraction))
        case other => throw new IllegalArgumentException(s"unsupported postAggregator $other")
      }
      str("name").map(named.as).getOrElse(named)
    case x => throw new IllegalArgumentException(s"bad postAggregator $x")
  }
}
