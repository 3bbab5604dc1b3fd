package graft.functions

import org.apache.datasketches.kll.KllDoublesSketch
import org.apache.datasketches.memory.Memory
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types._

/** Mergeable quantile sketches (Druid `quantilesDoublesSketch`) on
  * datasketches-java KLL: executors build per-partition sketches,
  * only ~k·8-byte summaries cross the shuffle, stored bytes
  * re-aggregate at coarser grains like every other graft sketch
  * metric. Exact while n ≤ k (the sketch retains all values), ~1.65%
  * rank error beyond.
  */
object KllSketch {

  /** Aggregate: build (or merge, for binary input) a KLL sketch. */
  def kll_sketch_agg(c: Column, k: Int = 200): Column =
    toColumn(KllSketchAgg(toExpr(c), k).toAggregateExpression())

  /** Quantile at rank q ∈ [0,1] from sketch bytes. */
  def kll_quantile(sketch: Column, q: Column): Column =
    toColumn(KllQuantile(toExpr(sketch), toExpr(q)))

  private[graft] def heapify(bytes: Array[Byte]): KllDoublesSketch =
    KllDoublesSketch.heapify(Memory.wrap(bytes))
}

case class KllSketchAgg(
    child: Expression,
    k: Int = 200,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllDoublesSketch] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): KllDoublesSketch =
    KllDoublesSketch.newHeapInstance(k)

  override def update(buffer: KllDoublesSketch, input: InternalRow): KllDoublesSketch = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType => buffer.merge(KllSketch.heapify(v.asInstanceOf[Array[Byte]]))
      case DoubleType => buffer.update(v.asInstanceOf[Double])
      case FloatType => buffer.update(v.asInstanceOf[Float].toDouble)
      case LongType => buffer.update(v.asInstanceOf[Long].toDouble)
      case IntegerType => buffer.update(v.asInstanceOf[Int].toDouble)
      case _ => buffer.update(v.toString.toDouble)
    }
    buffer
  }

  override def merge(buffer: KllDoublesSketch, other: KllDoublesSketch): KllDoublesSketch = {
    buffer.merge(other)
    buffer
  }

  override def eval(buffer: KllDoublesSketch): Any = buffer.toByteArray

  override def serialize(buffer: KllDoublesSketch): Array[Byte] = buffer.toByteArray

  override def deserialize(bytes: Array[Byte]): KllDoublesSketch = KllSketch.heapify(bytes)

  override def withNewMutableAggBufferOffset(o: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllSketchAgg =
    copy(child = c)
}

/** Quantile extraction from serialized KLL bytes (inclusive rank). */
case class KllQuantile(left: Expression, right: Expression)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(sketchBytes: Any, q: Any): Any = {
    val sk = KllSketch.heapify(sketchBytes.asInstanceOf[Array[Byte]])
    if (sk.isEmpty) null
    else sk.getQuantile(q.asInstanceOf[Double])
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KllQuantile =
    copy(left = l, right = r)
}
