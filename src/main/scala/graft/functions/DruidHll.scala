package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{BinaryType, DataType, DoubleType}

/** Druid `hyperUnique` (HyperLogLogCollector) sketch bytes — estimate
  * and merge, so hyperUnique metrics migrated off real Druid segments
  * (DruidSegmentReader) keep re-aggregating, exactly what the
  * reference's Pig adapters do over bags of sketch bytes
  * (druid-pig/udfs/AggregatorFactoryAdapter.java:43-119,
  * "hyperUnique" branch; bytes surface per
  * druid-pig/DruidStorage.java:139-152).
  *
  * Format (public, from Druid's HyperLogLogCollector): 2048 buckets
  * (11-bit index), 4-bit registers packed two per byte, plus a shared
  * `registerOffset` exponent base. Header: version(1)=1,
  * registerOffset(1), numNonZeroRegisters(2 BE), maxOverflowValue(1),
  * maxOverflowRegister(2 BE). Body: dense = 1024 packed bytes; sparse
  * = (bytePosition: 2 BE, byteValue: 1) triples.
  *
  * The estimator is the standard HLL one (alpha·m²/Σ2^-r with
  * linear-counting low-range correction). Druid layers further bias
  * corrections for the high range, so estimates here can drift from
  * Druid's own beyond ~2^30 cardinalities — fine for re-aggregation
  * checks; route new data through `hyperUnique`/theta aggregators
  * instead.
  */
object DruidHll {

  val NumBuckets = 2048
  private val AlphaMM = (0.7213 / (1 + 1.079 / NumBuckets)) * NumBuckets * NumBuckets

  /** Decode sketch bytes into the 2048 register values (offset folded in). */
  def registers(bytes: Array[Byte]): Array[Int] = {
    require(bytes.length >= 7 && bytes(0) == 1,
      s"not a Druid HLL sketch (version ${if (bytes.isEmpty) "?" else bytes(0)})")
    val registerOffset = bytes(1) & 0xff
    val regs = new Array[Int](NumBuckets)
    def addByte(bytePos: Int, b: Int): Unit = {
      regs(bytePos * 2) = registerOffset + ((b >>> 4) & 0xf)
      regs(bytePos * 2 + 1) = registerOffset + (b & 0xf)
    }
    val body = bytes.length - 7
    if (body == NumBuckets / 2) { // dense
      var i = 0
      while (i < NumBuckets / 2) { addByte(i, bytes(7 + i) & 0xff); i += 1 }
    } else { // sparse: (position short BE, value byte)
      require(body % 3 == 0, s"bad sparse HLL body length $body")
      // offset applies to every bucket; zero-bytes stay at the offset base
      java.util.Arrays.fill(regs, registerOffset)
      var i = 7
      while (i + 2 < bytes.length) {
        val pos = ((bytes(i) & 0xff) << 8) | (bytes(i + 1) & 0xff)
        addByte(pos, bytes(i + 2) & 0xff)
        i += 3
      }
    }
    regs
  }

  /** Standard HLL estimate over decoded registers. */
  def estimate(bytes: Array[Byte]): Double = {
    val regs = registers(bytes)
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < NumBuckets) {
      sum += math.pow(2.0, -regs(i))
      if (regs(i) == 0) zeros += 1
      i += 1
    }
    val e = AlphaMM / sum
    if (e <= 2.5 * NumBuckets && zeros > 0)
      NumBuckets * math.log(NumBuckets.toDouble / zeros)
    else e
  }

  /** Register-wise max merge; returns a dense sketch (version 1,
    * registerOffset 0 — offsets are folded into register values, which
    * caps mergeable cardinality at offset base 0 + 15 bits ≈ 2^15-
    * leading-zero runs, ample for re-aggregation checks). */
  def merge(a: Array[Int], bytes: Array[Byte]): Array[Int] = {
    val b = registers(bytes)
    var i = 0
    while (i < NumBuckets) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  def toDense(regs: Array[Int]): Array[Byte] = {
    val out = new Array[Byte](7 + NumBuckets / 2)
    out(0) = 1
    var nonZero = 0
    var i = 0
    while (i < NumBuckets / 2) {
      val hi = math.min(regs(i * 2), 15)
      val lo = math.min(regs(i * 2 + 1), 15)
      if (hi > 0) nonZero += 1
      if (lo > 0) nonZero += 1
      out(7 + i) = ((hi << 4) | lo).toByte
      i += 1
    }
    out(2) = ((nonZero >>> 8) & 0xff).toByte
    out(3) = (nonZero & 0xff).toByte
    out
  }

  /** Estimate of a Druid hyperUnique sketch bytes column. */
  def druid_hll_estimate(c: Column): Column = toColumn(DruidHllEstimate(toExpr(c)))

  /** Aggregate: merge Druid hyperUnique sketch bytes; returns merged
    * (dense) sketch bytes — feed to druid_hll_estimate to finalize. */
  def druid_hll_merge_agg(c: Column): Column =
    toColumn(DruidHllMergeAgg(toExpr(c)).toAggregateExpression())
}

case class DruidHllEstimate(child: Expression)
  extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    DruidHll.estimate(v.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(c: Expression): DruidHllEstimate =
    copy(child = c)
}

case class DruidHllMergeAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] with UnaryLike[Expression] {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false

  override def createAggregationBuffer(): Array[Int] =
    new Array[Int](DruidHll.NumBuckets)

  override def update(buffer: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) DruidHll.merge(buffer, v.asInstanceOf[Array[Byte]]) else buffer
  }

  override def merge(buffer: Array[Int], other: Array[Int]): Array[Int] = {
    var i = 0
    while (i < buffer.length) { if (other(i) > buffer(i)) buffer(i) = other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Int]): Any = DruidHll.toDense(buffer)

  override def serialize(buffer: Array[Int]): Array[Byte] = DruidHll.toDense(buffer)

  override def deserialize(bytes: Array[Byte]): Array[Int] =
    DruidHll.merge(createAggregationBuffer(), bytes)

  override def withNewMutableAggBufferOffset(o: Int): DruidHllMergeAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): DruidHllMergeAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): DruidHllMergeAgg =
    copy(child = c)
}
