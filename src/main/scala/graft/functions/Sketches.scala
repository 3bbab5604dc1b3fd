package graft.functions

import org.apache.datasketches.memory.Memory
import org.apache.datasketches.theta.{CompactSketch, SetOperation, Sketch, Union}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Theta sketches for approximate distinct counts WITH set operations
  * (union / intersection / difference) — the capability Druid's
  * `thetaSketch` aggregator provides and plain HLL cannot
  * (reference druid-pig/udfs/AggregatorFactoryAdapter.java applies any
  * Druid AggregatorFactory, sketches included, over grouped rows).
  *
  * Built on datasketches-java (bundled with Spark). The aggregate is a
  * `TypedImperativeAggregate` so partial aggregation applies: executors
  * build/merge sketches map-side and only k·8-byte compact sketches
  * cross the shuffle — at 100 TB the shuffle stays O(groups · k), never
  * O(rows). Estimates depend only on the input SET, so results are
  * reproducible across partitionings.
  *
  * Binary input columns are treated as serialized sketches and merged
  * (re-aggregation, ≙ the reference's NonFinalizingAggregatorFactory-
  * Adapter chain); other types are hashed as raw values.
  */
object Sketches {

  /** Aggregate: build (or merge) a theta sketch; returns sketch bytes. */
  def theta_sketch_agg(c: Column, nominalEntries: Int = 4096): Column =
    toColumn(ThetaSketchAgg(toExpr(c), nominalEntries).toAggregateExpression())

  /** Estimate of distinct count from sketch bytes. */
  def theta_estimate(c: Column): Column = toColumn(ThetaEstimate(toExpr(c)))

  /** Set operations over two serialized sketches. */
  def theta_union(a: Column, b: Column): Column = toColumn(ThetaSetOp(toExpr(a), toExpr(b), "union"))
  def theta_intersect(a: Column, b: Column): Column = toColumn(ThetaSetOp(toExpr(a), toExpr(b), "intersect"))
  def theta_anotb(a: Column, b: Column): Column = toColumn(ThetaSetOp(toExpr(a), toExpr(b), "anotb"))

  private[graft] def wrap(bytes: Array[Byte]): Sketch =
    CompactSketch.heapify(Memory.wrap(bytes))
}

case class ThetaSketchAgg(
    child: Expression,
    nominalEntries: Int = 4096,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Union] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Union =
    SetOperation.builder().setNominalEntries(nominalEntries).buildUnion()

  override def update(buffer: Union, input: InternalRow): Union = {
    val v = child.eval(input)
    if (v != null) child.dataType match {
      case BinaryType => buffer.union(Sketches.wrap(v.asInstanceOf[Array[Byte]]))
      case StringType => buffer.update(v.asInstanceOf[UTF8String].toString)
      case LongType => buffer.update(v.asInstanceOf[Long])
      case IntegerType => buffer.update(v.asInstanceOf[Int].toLong)
      case ShortType => buffer.update(v.asInstanceOf[Short].toLong)
      case DoubleType => buffer.update(v.asInstanceOf[Double])
      case FloatType => buffer.update(v.asInstanceOf[Float].toDouble)
      case dt => buffer.update(v.toString)
    }
    buffer
  }

  override def merge(buffer: Union, other: Union): Union = {
    buffer.union(other.getResult)
    buffer
  }

  override def eval(buffer: Union): Any =
    buffer.getResult.toByteArray

  override def serialize(buffer: Union): Array[Byte] =
    buffer.getResult.toByteArray

  override def deserialize(bytes: Array[Byte]): Union = {
    val u = createAggregationBuffer()
    u.union(Sketches.wrap(bytes))
    u
  }

  override def withNewMutableAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): ThetaSketchAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): ThetaSketchAgg =
    copy(child = c)
}

case class ThetaEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any = v match {
    case b: Array[Byte] => Sketches.wrap(b).getEstimate
    case d: java.lang.Double => d.doubleValue() // already finalized
  }
  override protected def withNewChildInternal(c: Expression): ThetaEstimate = copy(child = c)
}

/** union / intersect / anotb over two serialized theta sketches. */
case class ThetaSetOp(left: Expression, right: Expression, op: String)
  extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = Sketches.wrap(a.asInstanceOf[Array[Byte]])
    val sb = Sketches.wrap(b.asInstanceOf[Array[Byte]])
    val out: Sketch = op match {
      case "union" =>
        val u = SetOperation.builder().buildUnion()
        u.union(sa); u.union(sb); u.getResult
      case "intersect" =>
        val i = SetOperation.builder().buildIntersection()
        i.intersect(sa); i.intersect(sb); i.getResult
      case "anotb" =>
        val d = SetOperation.builder().buildANotB()
        d.setA(sa); d.notB(sb); d.getResult(true)
    }
    out.toByteArray
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression): ThetaSetOp =
    copy(left = l, right = r)
}
