package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType}

/** Product quantization (PQ — Jégou/Douze/Schmid 2011, "Product
  * Quantization for Nearest Neighbor Search") primitives: split a
  * D-dim vector into `m` contiguous subvectors of D/m dims, quantize
  * each subvector to the id of its nearest codebook entry (≤ 256
  * entries per subspace → ONE byte per subspace). Storage per vector
  * is `m` bytes — 32× smaller than float32 at D=64/m=8, where SQ8
  * gives 4×: the regime where even the SQ8 index no longer fits its
  * store.
  *
  * Both expressions keep the repo's cross-engine-exactness contract:
  * `PqEncode`'s per-subspace argmin compares sequentially-folded
  * squared-L2 distances (every +, −, × exactly rounded, ties to the
  * lowest code — same total order as the SQL mirror's
  * `ORDER BY dist, c`), and `PqAdcCosine` is the ASYMMETRIC distance
  * computation (the "ADC" of the paper): the full-precision query
  * against the corpus vector's reconstruction (concatenated codebook
  * entries), folded in ascending dimension order — bit-identical to a
  * SQL engine reconstructing the same list and folding the same
  * cosine. The codebook rides inside the expression (driver-collected,
  * m × ks × D/m doubles — centroid-table-sized), so both are pure
  * projections under whole-stage codegen: no join, no shuffle, no UDF.
  */
object Pq {

  /** PQ-encode an `array<double>` vector to `m` code bytes (BINARY).
    * `codebook(j)(c)` = subspace `j`'s entry `c` (a D/m-dim
    * subvector). */
  def encode(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqEncode(toExpr(vec), codebook))

  /** Asymmetric (query full-precision, corpus reconstructed) cosine
    * of a query vector against a PQ code vector. */
  def adcCosine(query: Column, codes: Column,
                codebook: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqAdcCosine(toExpr(query), toExpr(codes), codebook))

  /** [[encode]] as `array<int>` instead of BINARY — the form the
    * k-means codebook trainer's assignment pass consumes (an exploded
    * (pos, x) row picks its subspace's code with `element_at`; byte
    * extraction from BINARY has no codegen-friendly SQL spelling).
    * Same argmin, same tie-break — spec-pinned equal to [[encode]]. */
  def encodeCodes(vec: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    toColumn(PqEncodeInts(toExpr(vec), codebook))

  private[functions] def validate(codebook: Seq[Seq[Seq[Double]]]): Unit = {
    require(codebook.nonEmpty, "empty PQ codebook")
    require(codebook.forall(_.nonEmpty), "PQ codebook has an empty subspace")
    require(codebook.forall(_.length <= 256),
      s"PQ codebook has ${codebook.map(_.length).max} entries in a " +
        "subspace — codes are one byte, max 256")
    val subDim = codebook.head.head.length
    require(subDim > 0 && codebook.forall(_.forall(_.length == subDim)),
      "PQ codebook entries must all share one subvector dimension")
  }
}

case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  Pq.validate(codebook)

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode needs array<double>, got ${other.simpleString(10)}")
    }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDim: Int = cb(0)(0).length

  /** Public for the generated-code reference-object call. */
  def encode(v: ArrayData): Array[Byte] = {
    val m = cb.length
    require(v.numElements() == m * subDim,
      s"pq_encode: vector has ${v.numElements()} dims, codebook covers " +
        s"$m x $subDim")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val entries = cb(j)
      val base = j * subDim
      var best = 0
      var bestD = Double.PositiveInfinity
      var c = 0
      while (c < entries.length) {
        val e = entries(c)
        var acc = 0.0
        var t = 0
        while (t < subDim) {
          val d = v.getDouble(base + t) - e(t)
          acc += d * d
          t += 1
        }
        // strict < keeps the LOWEST code on ties — the mirror's
        // ORDER BY dist ASC, c ASC
        if (acc < bestD) { bestD = acc; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def nullSafeEval(v: Any): Any = encode(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.encode($x);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncode = copy(child = c)
}

/** [[PqEncode]] emitting `array<int>` codes — delegates to the same
  * argmin (one implementation, the two forms cannot drift). */
case class PqEncodeInts(child: Expression, codebook: Seq[Seq[Seq[Double]]])
  extends UnaryExpression {

  Pq.validate(codebook)

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode_codes needs array<double>, got ${other.simpleString(10)}")
    }

  @transient private lazy val delegate = PqEncode(child, codebook)

  /** Public for the generated-code reference-object call. */
  def encodeInts(v: ArrayData): ArrayData = {
    val bytes = delegate.encode(v)
    val out = new Array[Int](bytes.length)
    var i = 0
    while (i < bytes.length) { out(i) = bytes(i) & 0xff; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def nullSafeEval(v: Any): Any = encodeInts(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqEncodeInts", this, classOf[PqEncodeInts].getName)
    nullSafeCodeGen(ctx, ev, x => s"${ev.value} = $ref.encodeInts($x);")
  }

  override protected def withNewChildInternal(c: Expression): PqEncodeInts =
    copy(child = c)
}

case class PqAdcCosine(left: Expression, right: Expression,
                       codebook: Seq[Seq[Seq[Double]]])
  extends BinaryExpression {

  Pq.validate(codebook)

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), BinaryType) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_adc_cosine needs (array<double>, binary), got " +
            s"${l.simpleString(10)}, ${r.simpleString(10)}")
    }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val subDim: Int = cb(0)(0).length

  /** Public for the generated-code reference-object call. Sequential
    * ascending-dimension accumulation over (query, reconstruction) —
    * bit-identical to the DuckDB mirror's list_sum folds over the
    * same reconstructed list. */
  def score(q: ArrayData, codes: Array[Byte]): Double = {
    // a code vector whose length differs from the codebook's m was
    // built under different PQ geometry (or is truncated/corrupt) —
    // refuse loudly, never score a silent prefix (the same stance as
    // the out-of-range code check below)
    require(codes.length == cb.length,
      s"pq_adc_cosine: code vector has ${codes.length} byte(s), codebook " +
        s"has ${cb.length} subspace(s) — codes from a different codebook " +
        "geometry?")
    val m = cb.length
    var dot = 0.0; var nq = 0.0; var nr = 0.0
    var j = 0
    while (j < m) {
      val entries = cb(j)
      val c = codes(j) & 0xff
      require(c < entries.length,
        s"pq_adc_cosine: code $c out of range for subspace $j " +
          s"(${entries.length} entries) — codes from a different codebook?")
      val e = entries(c)
      val base = j * subDim
      var t = 0
      while (t < subDim) {
        val xq = q.getDouble(base + t)
        val xr = e(t)
        dot += xq * xr; nq += xq * xq; nr += xr * xr
        t += 1
      }
      j += 1
    }
    dot / (math.sqrt(nq) * math.sqrt(nr))
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    score(a.asInstanceOf[ArrayData], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqAdcCosine", this, classOf[PqAdcCosine].getName)
    nullSafeCodeGen(ctx, ev, (x, y) => s"${ev.value} = $ref.score($x, $y);")
  }

  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqAdcCosine =
    copy(left = l, right = r)
}
