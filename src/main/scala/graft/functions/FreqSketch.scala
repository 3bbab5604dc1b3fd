package graft.functions

import org.apache.datasketches.common.ArrayOfStringsSerDe
import org.apache.datasketches.frequencies.{ErrorType, ItemsSketch}
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Frequent-items (heavy hitters) sketch — the DataSketches
  * frequencies family Druid exposes as its `frequencies` aggregator
  * (same library as the theta sketch, reference
  * druid-pig/udfs/AggregatorFactoryAdapter.java applies any Druid
  * AggregatorFactory over grouped rows).
  *
  * Scale design: a Misra-Gries-style summary of ≤ `maxMapSize`
  * counters per group. Partial aggregation applies (TypedImperative),
  * so executors stream their partitions into local sketches and only
  * the tiny summaries shuffle — a skewed 10^9-row group costs
  * O(maxMapSize) shuffle bytes, never a per-item explosion. Guarantees
  * (library invariants): estimates bracket the true count
  * (lb ≤ true ≤ ub) with max error ≤ ~3.5·n/maxMapSize, and when the
  * distinct-item count fits the map the sketch is EXACT
  * (lb = est = ub = true count) — the regime the driver oracle gates;
  * the estimate regime is spec-tested against the bounds.
  */
object FreqSketch {

  /** Aggregate: build (or merge, for a BinaryType child) a frequent-
    * items sketch over strings; returns sketch bytes. `maxMapSize`
    * must be a power of 2. */
  def freq_sketch_agg(c: Column, maxMapSize: Int = 64): Column =
    toColumn(FreqSketchAgg(toExpr(c), maxMapSize).toAggregateExpression())

  /** Extract frequent items from sketch bytes, no-false-negatives
    * policy: array<struct<item, est, lb, ub>> sorted by (est desc,
    * item) — a deterministic total order. */
  def freq_items(c: Column): Column = toColumn(FreqItemsExtract(toExpr(c)))

  private[graft] val serde = new ArrayOfStringsSerDe

  private[graft] def wrap(bytes: Array[Byte]): ItemsSketch[String] =
    ItemsSketch.getInstance[String](Memory.wrap(bytes), serde)
}

case class FreqSketchAgg(
    child: Expression,
    maxMapSize: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[ItemsSketch[String]] with UnaryLike[Expression] {
  require(maxMapSize >= 2 && (maxMapSize & (maxMapSize - 1)) == 0,
    "maxMapSize must be a power of 2")

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): ItemsSketch[String] =
    new ItemsSketch[String](maxMapSize)

  override def update(buffer: ItemsSketch[String], input: InternalRow): ItemsSketch[String] = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType => buffer.merge(FreqSketch.wrap(v.asInstanceOf[Array[Byte]]))
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case _ => buffer.update(v.toString)
    }
    buffer
  }

  override def merge(buffer: ItemsSketch[String], other: ItemsSketch[String]): ItemsSketch[String] = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: ItemsSketch[String]): Any =
    buffer.toByteArray(FreqSketch.serde)

  override def serialize(buffer: ItemsSketch[String]): Array[Byte] =
    buffer.toByteArray(FreqSketch.serde)

  override def deserialize(bytes: Array[Byte]): ItemsSketch[String] =
    FreqSketch.wrap(bytes)

  override def withNewMutableAggBufferOffset(o: Int): FreqSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): FreqSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): FreqSketchAgg =
    copy(child = c)
}

/** Sketch bytes → frequent items with bounds, deterministic order.
  * NO_FALSE_NEGATIVES: every true heavy hitter appears (some light
  * items may too); in the exact regime this is simply every item. */
case class FreqItemsExtract(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("lb", LongType, nullable = false),
    StructField("ub", LongType, nullable = false))), containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val sk = FreqSketch.wrap(v.asInstanceOf[Array[Byte]])
    val rows = sk.getFrequentItems(ErrorType.NO_FALSE_NEGATIVES)
    val sorted = rows.sortBy(r => (-r.getEstimate, r.getItem))
    new GenericArrayData(sorted.map { r =>
      InternalRow(UTF8String.fromString(r.getItem),
        r.getEstimate, r.getLowerBound, r.getUpperBound)
    }.asInstanceOf[Array[Any]])
  }
  override protected def withNewChildInternal(c: Expression): FreqItemsExtract =
    copy(child = c)
}
