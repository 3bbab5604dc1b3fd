package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Vector primitives for the similarity operators. */
object VectorFunctions {

  /** All hyperplane-LSH table signatures for a double vector in ONE
    * pass: the inner loop walks the vector once and accumulates every
    * (table × plane) dot product — versus evaluating tables × planes
    * separate fold expressions (which made the LSH bucketing the
    * dominant cost of embedding dedup). Output: array<string> of
    * "t:bitstring" bucket keys, one per table. */
  def hyperplaneBuckets(vec: Column, planes: Array[Array[Double]],
                        numTables: Int, numPlanes: Int): Column =
    toColumn(HyperplaneBuckets(toExpr(vec), planes, numTables, numPlanes))
}

case class HyperplaneBuckets(
    child: Expression,
    planes: Array[Array[Double]], // (numTables*numPlanes) × dim, row-major
    numTables: Int,
    numPlanes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val nAll = numTables * numPlanes
    val dots = new Array[Double](nAll)
    var d = 0
    while (d < dim) {
      val x = arr.getDouble(d)
      var p = 0
      while (p < nAll) {
        val plane = planes(p)
        if (d < plane.length) dots(p) += x * plane(d)
        p += 1
      }
      d += 1
    }
    val out = new Array[AnyRef](numTables)
    var t = 0
    while (t < numTables) {
      val sb = new java.lang.StringBuilder(numPlanes + 4)
      sb.append(t).append(':')
      var p = 0
      while (p < numPlanes) {
        sb.append(if (dots(t * numPlanes + p) >= 0) '1' else '0')
        p += 1
      }
      out(t) = UTF8String.fromString(sb.toString)
      t += 1
    }
    new GenericArrayData(out)
  }

  // case-class equality on Array fields is reference-based, which is
  // fine: the planes are fixed per operator instantiation
  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}
