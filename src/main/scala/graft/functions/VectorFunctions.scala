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
    * "t:bitstring" bucket keys, one per table.
    *
    * The hyperplanes are derived deterministically from `seed` and the
    * vector dimension at eval time (java.util.Random's specified
    * gaussian sequence), so no driver-side pass over the data is
    * needed to size them — the dimension is read off the first row
    * each executor sees and the matrix is cached per instance. */
  def hyperplaneBuckets(vec: Column, seed: Long,
                        numTables: Int, numPlanes: Int): Column =
    toColumn(HyperplaneBuckets(toExpr(vec), seed, numTables, numPlanes))
}

case class HyperplaneBuckets(
    child: Expression,
    seed: Long,
    numTables: Int,
    numPlanes: Int)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  // Lazily-built (numTables*numPlanes) × dim plane matrix. Each task
  // deserializes its own expression instance, and a racing rebuild
  // computes identical values (pure function of seed × dim), so the
  // unsynchronized cache is benign. Vectors of differing dims within
  // one dataset get per-dim plane sets — their buckets simply never
  // collide, which is correct (cross-dim cosine is undefined anyway).
  @transient private var cachedDim: Int = -1
  @transient private var cachedPlanes: Array[Array[Double]] = _

  private def planesFor(dim: Int): Array[Array[Double]] = {
    if (cachedDim != dim) {
      val rng = new java.util.Random(seed)
      cachedPlanes = Array.fill(numTables * numPlanes, dim)(rng.nextGaussian())
      cachedDim = dim
    }
    cachedPlanes
  }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val dim = arr.numElements()
    val planes = planesFor(dim)
    val nAll = numTables * numPlanes
    val dots = new Array[Double](nAll)
    var d = 0
    while (d < dim) {
      val x = arr.getDouble(d)
      var p = 0
      while (p < nAll) {
        dots(p) += x * planes(p)(d)
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

  override protected def withNewChildInternal(c: Expression): HyperplaneBuckets = copy(child = c)
}
