package graft.operators

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.sql.{Column, DataFrame}

/** Z-order (Morton curve) data layout for multi-dimensional pruning.
  *
  * Parquet/segment pruning is driven by per-file (and per-row-group)
  * min/max stats, which only help when the layout CLUSTERS the
  * filtered column. A linear sort clusters exactly one column; at
  * 100 TB a filter on any other dimension touches every file. Z-order
  * interleaves the bits of several columns' rank-buckets so that files
  * cover small HYPER-RECTANGLES of the key space — a selective filter
  * on ANY of the z-columns prunes most files (the classic trade:
  * each dimension's clustering degrades ~2^((k-1)/k) instead of one
  * dimension getting everything).
  *
  * Scale design: bucket boundaries come from `approxQuantile` (a
  * bounded sample-based action, ≤ 2^bits doubles per column — not a
  * per-column global sort), bucket lookup is a binary search per row,
  * the Morton weave is pure codegen'd bit arithmetic, and the final
  * placement is ONE `repartitionByRange` + in-partition sort on the
  * z-value — the same single shuffle any write-side `ORDER BY`
  * costs. Layout changes row ORDER only, never row content.
  */
object ZOrder {

  /** Rows of `df` re-laid-out along the Morton curve of `cols`
    * (numeric columns). `bits` buckets per dimension (2^bits ranges,
    * quantile-spaced so skew cannot collapse the curve);
    * `partitions` = output partitioning (0 → session default). */
  def layout(df: DataFrame, cols: Seq[String], bits: Int = 8,
             partitions: Int = 0): DataFrame = {
    require(cols.nonEmpty && cols.size * bits <= 63,
      s"cols*bits must fit a long, got ${cols.size} x $bits")
    val nb = (1 << bits) - 1 // boundary count per column
    val probs = (1 to nb).map(_.toDouble / (nb + 1)).toArray
    val zc = zValue(df, cols, probs)
    val p = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    df.withColumn("__graft_z", zc)
      .repartitionByRange(p, col("__graft_z"))
      .sortWithinPartitions("__graft_z")
      .drop("__graft_z")
  }

  /** The z (Morton) value column for `df`: per-column sampled quantile
    * boundaries → bucket ids → bit interleave (bit i of column j lands
    * at position i·k + j). */
  private def zValue(df: DataFrame, cols: Seq[String], probs: Array[Double]): Column = {
    val k = cols.size
    val bounds: Map[String, Array[Double]] =
      cols.map(c => c -> df.stat.approxQuantile(c, probs, 0.001)).toMap
    val bits = 32 - Integer.numberOfLeadingZeros(probs.length) // ceil log2(nb+1)
    val z = cols.zipWithIndex.foldLeft(lit(0L)) { case (acc, (c, j)) =>
      val bucket = toColumn(RangeBucket(toExpr(col(c).cast("double")), bounds(c)))
      (0 until bits).foldLeft(acc) { (a, i) =>
        a.bitwiseOR(shiftleft(bucket.cast("long").bitwiseAND(lit(1L << i)),
          i * (k - 1) + j))
      }
    }
    z
  }
}

/** Bucket index of a double among sorted `boundaries` (binary search):
  * #boundaries ≤ value. Nulls and NaNs sort first (bucket 0), matching
  * their min/max-stat irrelevance. Real `doGenCode` (a local binary
  * search over a referenced array) so the z-value projection stays
  * inside whole-stage codegen — it sits immediately before the
  * range-repartition exchange and would otherwise break the stage. */
case class RangeBucket(child: Expression, boundaries: Array[Double])
  extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    val d = v.asInstanceOf[Double]
    if (d.isNaN) return 0
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (boundaries(mid) <= d) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val b = ctx.addReferenceObj("rangeBucketBounds", boundaries, "double[]")
    val childGen = child.genCode(ctx)
    val d = ctx.freshName("rbVal")
    val lo = ctx.freshName("rbLo")
    val hi = ctx.freshName("rbHi")
    val mid = ctx.freshName("rbMid")
    // null / NaN → bucket 0; result itself is never null
    val javaCode =
      code"""
         |${childGen.code}
         |int ${ev.value} = 0;
         |if (!${childGen.isNull}) {
         |  double $d = ${childGen.value};
         |  if (!Double.isNaN($d)) {
         |    int $lo = 0;
         |    int $hi = $b.length;
         |    while ($lo < $hi) {
         |      int $mid = ($lo + $hi) >>> 1;
         |      if ($b[$mid] <= $d) { $lo = $mid + 1; } else { $hi = $mid; }
         |    }
         |    ${ev.value} = $lo;
         |  }
         |}
       """.stripMargin
    ev.copy(code = javaCode, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(c: Expression): RangeBucket =
    copy(child = c)
}
