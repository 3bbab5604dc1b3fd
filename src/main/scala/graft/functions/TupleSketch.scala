package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.tuple.arrayofdoubles._
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.struct
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Tuple (ArrayOfDoubles) sketch — Druid's `arrayOfDoublesSketch`
  * aggregator (druid-datasketches extension; the reference applies any
  * Druid AggregatorFactory over grouped rows,
  * druid-pig/udfs/AggregatorFactoryAdapter.java:43-119): a theta-style
  * distinct-key sample where each retained key carries an array of
  * double metrics summed per key. One sketch answers both "how many
  * distinct keys" and "metric totals", stays mergeable, and supports
  * the theta set operations over keyed metrics.
  *
  * Scale: TypedImperativeAggregate → partial aggregation; a group of
  * any row count ships ≤ nominalEntries entries (key hash + m doubles)
  * across the shuffle. Below nominalEntries the sketch is EXACT
  * (theta = 1: estimate = true distinct count, metric sums = true
  * sums) — the regime the driver oracle gates; above, it is a uniform
  * key sample with the usual theta error bounds.
  */
object TupleSketch {

  /** Aggregate: build a tuple sketch from a key column + metric
    * columns. Rows with a NULL key are skipped; NULL metrics count 0. */
  def tuple_sketch_agg(key: Column, metrics: Seq[Column],
                       nominalEntries: Int = 4096): Column = {
    require(metrics.nonEmpty, "tuple sketch needs >= 1 metric column")
    toColumn(TupleSketchAgg(toExpr(struct(key +: metrics: _*)),
      metrics.size, nominalEntries).toAggregateExpression())
  }

  /** Aggregate: merge already-built sketch bytes (re-aggregation). */
  def tuple_merge_agg(sketch: Column, numMetrics: Int,
                      nominalEntries: Int = 4096): Column =
    toColumn(TupleSketchAgg(toExpr(sketch), numMetrics,
      nominalEntries).toAggregateExpression())

  /** Distinct-key estimate from sketch bytes. */
  def tuple_estimate(c: Column): Column = toColumn(TupleEstimate(toExpr(c)))

  /** Per-metric sum estimates from sketch bytes: array<double> of
    * Σ values / theta (exact sums below nominalEntries). */
  def tuple_metric_sums(c: Column): Column = toColumn(TupleMetricSums(toExpr(c)))

  def tuple_metric_means(c: Column): Column = toColumn(TupleMetricMeans(toExpr(c)))

  private[graft] def wrap(bytes: Array[Byte]): ArrayOfDoublesSketch =
    ArrayOfDoublesSketches.wrapSketch(Memory.wrap(bytes))
}

/** Aggregation buffer: raw rows go into an updatable sketch; merged
  * partials into a lazily-created union. */
private[functions] final class TupleBuf(numMetrics: Int, nomEntries: Int) {
  val upd: ArrayOfDoublesUpdatableSketch =
    new ArrayOfDoublesUpdatableSketchBuilder()
      .setNumberOfValues(numMetrics).setNominalEntries(nomEntries).build()
  private var uni: ArrayOfDoublesUnion = _
  def union(sk: ArrayOfDoublesSketch): Unit = {
    if (uni == null)
      uni = new ArrayOfDoublesSetOperationBuilder()
        .setNumberOfValues(numMetrics).setNominalEntries(nomEntries).buildUnion()
    uni.union(sk)
  }
  def result: ArrayOfDoublesCompactSketch =
    if (uni == null) upd.compact()
    else { uni.union(upd.compact()); uni.getResult }
}

case class TupleSketchAgg(
    child: Expression,
    numMetrics: Int,
    nominalEntries: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TupleBuf] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): TupleBuf =
    new TupleBuf(numMetrics, nominalEntries)

  override def update(buffer: TupleBuf, input: InternalRow): TupleBuf = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType =>
        buffer.union(TupleSketch.wrap(v.asInstanceOf[Array[Byte]]))
      case st: StructType =>
        val row = v.asInstanceOf[InternalRow]
        if (!row.isNullAt(0)) {
          val vals = new Array[Double](numMetrics)
          var j = 0
          while (j < numMetrics) {
            if (!row.isNullAt(j + 1))
              vals(j) = st.fields(j + 1).dataType match {
                case DoubleType => row.getDouble(j + 1)
                case FloatType => row.getFloat(j + 1).toDouble
                case LongType => row.getLong(j + 1).toDouble
                case IntegerType => row.getInt(j + 1).toDouble
                case dt => throw new IllegalArgumentException(s"bad metric type $dt")
              }
            j += 1
          }
          st.fields(0).dataType match {
            case LongType => buffer.upd.update(row.getLong(0), vals)
            case IntegerType => buffer.upd.update(row.getInt(0).toLong, vals)
            case StringType => buffer.upd.update(row.getUTF8String(0).toString, vals)
            case dt => throw new IllegalArgumentException(s"bad key type $dt")
          }
        }
      case dt => throw new IllegalArgumentException(s"bad tuple agg input $dt")
    }
    buffer
  }

  override def merge(buffer: TupleBuf, other: TupleBuf): TupleBuf = {
    buffer.union(other.result)
    buffer
  }

  override def eval(buffer: TupleBuf): Any = buffer.result.toByteArray

  override def serialize(buffer: TupleBuf): Array[Byte] =
    buffer.result.toByteArray

  override def deserialize(bytes: Array[Byte]): TupleBuf = {
    val b = createAggregationBuffer()
    b.union(TupleSketch.wrap(bytes))
    b
  }

  override def withNewMutableAggBufferOffset(o: Int): TupleSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): TupleSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): TupleSketchAgg =
    copy(child = c)
}

case class TupleEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    TupleSketch.wrap(v.asInstanceOf[Array[Byte]]).getEstimate
  override protected def withNewChildInternal(c: Expression): TupleEstimate =
    copy(child = c)
}

/** Druid's arrayOfDoublesSketchToMeans: per-metric mean over the
  * sketch's RETAINED entries (no theta scaling — means are
  * ratio-of-retained statistics, matching DataSketches'
  * ArrayOfDoublesSketchToMeansPostAggregator). Empty sketch → nulls. */
case class TupleMetricMeans(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = true)
  override def nullSafeEval(v: Any): Any = {
    val sk = TupleSketch.wrap(v.asInstanceOf[Array[Byte]])
    val m = sk.getNumValues
    val sums = new Array[Double](m)
    var n = 0L
    val it = sk.iterator()
    while (it.next()) {
      val vals = it.getValues
      var j = 0
      while (j < m) { sums(j) += vals(j); j += 1 }
      n += 1
    }
    if (n == 0L) new GenericArrayData(Array.fill[Any](m)(null))
    else {
      var j = 0
      while (j < m) { sums(j) /= n.toDouble; j += 1 }
      new GenericArrayData(sums)
    }
  }
  override protected def withNewChildInternal(c: Expression): TupleMetricMeans =
    copy(child = c)
}

case class TupleMetricSums(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullSafeEval(v: Any): Any = {
    val sk = TupleSketch.wrap(v.asInstanceOf[Array[Byte]])
    val m = sk.getNumValues
    val sums = new Array[Double](m)
    val it = sk.iterator()
    while (it.next()) {
      val vals = it.getValues
      var j = 0
      while (j < m) { sums(j) += vals(j); j += 1 }
    }
    val theta = sk.getTheta
    var j = 0
    while (j < m) { sums(j) /= theta; j += 1 }
    new GenericArrayData(sums)
  }
  override protected def withNewChildInternal(c: Expression): TupleMetricSums =
    copy(child = c)
}
