package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, LongType}

/** Scalar (SQ8) embedding quantization primitives.
  *
  * `QuantizeInt8` maps an `array<double>` vector to one unsigned byte
  * per dimension under per-dimension affine bounds:
  * `code = clamp(floor((x - lo) * 255 / (hi - lo)), 0, 255)` — stored
  * as BINARY, a 4× (vs float32) / 8× (vs the double working form)
  * memory cut, which at 100 TB is the difference between an index that
  * fits executor memory and one that doesn't. The arithmetic is pure
  * IEEE-754 double +,−,×,÷ and floor — all exactly-rounded operations,
  * so DuckDB evaluating the same formula produces bit-identical codes
  * and the driver gate can hash-match quantized results end-to-end.
  *
  * `ByteDot` is the symmetric SQ8 distance: the integer dot product of
  * two code vectors (sum of unsigned-byte products, exact in a long) —
  * integer arithmetic, so ranking is deterministic and cross-engine
  * exact, unlike float scores.
  */
object Quantize {

  /** Quantize an `array<double>` to SQ8 codes (BINARY) under the given
    * per-dimension bounds. `los`/`his` are the corpus per-dimension
    * min/max (driver-collected — dim-bounded, like a centroid table). */
  def int8(vec: Column, los: Seq[Double], his: Seq[Double]): Column =
    toColumn(QuantizeInt8(toExpr(vec), los, his))

  /** Integer dot product of two SQ8 code vectors (unsigned bytes). */
  def byteDot(a: Column, b: Column): Column =
    toColumn(ByteDot(toExpr(a), toExpr(b)))

  /** Cosine of the DEQUANTIZED values of two SQ8 code vectors — the
    * asymmetric-distance-computation (ADC) scoring every SQ8 index
    * uses: each byte reconstructs to the center of its quantization
    * bin (`lo + (code + 0.5) * (hi - lo) / 255`), then the standard
    * sequential cosine fold runs over the reconstructed doubles.
    * Every step is an exactly-rounded IEEE double op, so the score is
    * bit-identical to a SQL engine evaluating the same formula. */
  def dequantCosine(a: Column, b: Column, los: Seq[Double], his: Seq[Double]): Column =
    toColumn(DequantCosine(toExpr(a), toExpr(b), los, his))
}

case class QuantizeInt8(child: Expression, los: Seq[Double], his: Seq[Double])
  extends UnaryExpression {

  require(los.nonEmpty && los.length == his.length,
    s"need matching non-empty bounds, got ${los.length}/${his.length}")

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"quantize_int8 needs array<double>, got ${other.simpleString(10)}")
    }

  @transient private lazy val lo: Array[Double] = los.toArray
  @transient private lazy val hi: Array[Double] = his.toArray

  /** Public so generated code can call it via a reference object (same
    * pattern as NearestCell — the per-dimension loop stays one virtual
    * call inside whole-stage codegen). */
  def quantize(v: ArrayData): Array[Byte] = {
    val n = math.min(v.numElements(), lo.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val l = lo(i); val h = hi(i)
      val code =
        if (h == l) 0L
        else {
          // ((x-lo)*255)/(hi-lo): left-assoc double ops, mirrored
          // verbatim by the SQL oracle — every step exactly rounded
          val q = math.floor((v.getDouble(i) - l) * 255.0 / (h - l))
          if (q < 0.0) 0L else if (q > 255.0) 255L else q.toLong
        }
      out(i) = code.toByte
      i += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = quantize(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("quantizeInt8", this, classOf[QuantizeInt8].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.quantize($x);")
  }

  override protected def withNewChildInternal(c: Expression): QuantizeInt8 = copy(child = c)
}

case class ByteDot(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"byte_dot needs two binary, got ${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[Array[Byte]]
    val y = b.asInstanceOf[Array[Byte]]
    val n = math.min(x.length, y.length)
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += (x(i) & 0xff).toLong * (y(i) & 0xff).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($x.length, $y.length);
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (long)($x[$i] & 0xff) * (long)($y[$i] & 0xff);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): ByteDot =
    copy(left = l, right = r)
}

case class DequantCosine(left: Expression, right: Expression,
                         los: Seq[Double], his: Seq[Double])
  extends BinaryExpression {

  require(los.nonEmpty && los.length == his.length,
    s"need matching non-empty bounds, got ${los.length}/${his.length}")

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (BinaryType, BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dequant_cosine needs two binary, got ${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  @transient private lazy val lo: Array[Double] = los.toArray
  @transient private lazy val hi: Array[Double] = his.toArray

  /** Public for the generated-code reference-object call. Sequential
    * ascending-index accumulation — bit-identical to the DuckDB
    * mirror's list_sum fold over the same reconstruction formula. */
  def score(a: Array[Byte], b: Array[Byte]): Double = {
    val n = math.min(math.min(a.length, b.length), lo.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val l = lo(i); val h = hi(i)
      val xa = l + ((a(i) & 0xff) + 0.5) * (h - l) / 255.0
      val xb = l + ((b(i) & 0xff) + 0.5) * (h - l) / 255.0
      dot += xa * xb; na += xa * xa; nb += xb * xb
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    score(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("dequantCosine", this, classOf[DequantCosine].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.score($x, $y);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DequantCosine =
    copy(left = l, right = r)
}
