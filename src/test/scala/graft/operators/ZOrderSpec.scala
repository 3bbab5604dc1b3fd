package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  // 100k rows, two independent uniform-ish dims in [0, 1000)
  private lazy val df = (0 until 100000).map { i =>
    val x = math.abs(i * 1103515245 + 12345) % 1000
    val y = math.abs(i * 69069 + 1) % 1000
    (i.toLong, x.toLong, y.toLong)
  }.toDF("id", "x", "y")

  private def writeAndCount(dir: String, laidOut: org.apache.spark.sql.DataFrame,
                            filter: org.apache.spark.sql.Column): (Long, Long) = {
    laidOut.write.mode("overwrite").option("maxRecordsPerFile", "5000").parquet(dir)
    val back = spark.read.parquet(dir)
    val total = back.select(input_file_name()).distinct().count()
    val touched = back.filter(filter)
      .select(input_file_name()).distinct().count()
    (touched, total)
  }

  test("z-order prunes files on BOTH dimensions; linear only on one") {
    val tmp = java.nio.file.Files.createTempDirectory("zorder").toString
    val linear = df.repartitionByRange(8, col("x")).sortWithinPartitions("x")
    val zord = ZOrder.layout(df, Seq("x", "y"), bits = 8, partitions = 8)

    val yFilter = col("y").between(100, 119) // 2% of the y range
    val (linY, linTotal) = writeAndCount(s"$tmp/linear", linear, yFilter)
    val (zY, zTotal) = writeAndCount(s"$tmp/zord", zord, yFilter)
    // a y-filter over an x-sorted layout hits essentially every file
    assert(linY > linTotal * 3 / 4, s"linear y-filter touched $linY of $linTotal")
    // the z-order clusters y too: same filter touches far fewer files
    assert(zY * 2 < linY, s"z-order touched $zY vs linear $linY")

    val xFilter = col("x").between(100, 119)
    val backZ = spark.read.parquet(s"$tmp/zord")
    val zX = backZ.filter(xFilter).select(input_file_name()).distinct().count()
    // x stays clustered as well — the curve trades, it doesn't give up
    assert(zX * 2 < zTotal, s"z-order x-filter touched $zX of $zTotal")
  }

  test("layout changes row order only, never content") {
    val zord = ZOrder.layout(df, Seq("x", "y"), bits = 6, partitions = 4)
    assert(zord.count() == 100000)
    assert(zord.except(df).isEmpty && df.except(zord).isEmpty)
  }

  test("RangeBucket is real codegen and matches interpreted eval") {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.BoundReference
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.graftbridge.{toColumn, toExpr}
    import org.apache.spark.sql.types.DoubleType
    val bounds = Array(10.0, 20.0, 30.0)
    val expr = RangeBucket(BoundReference(0, DoubleType, nullable = true), bounds)
    assert(!expr.isInstanceOf[CodegenFallback])
    val vals: Seq[java.lang.Double] =
      Seq(Double.NaN, -1.0, 9.999, 10.0, 15.0, 20.0, 29.9, 30.0, 1e9, null)
    // interpreted
    val interp = vals.map(v => expr.eval(InternalRow(v)))
    assert(interp == Seq(0, 0, 0, 1, 1, 2, 2, 3, 3, 0))
    // codegen path (default executed plan) agrees, and the projection
    // stays inside WholeStageCodegen (a starred Project)
    // repartition(1) blocks ConvertToLocalRelation from eagerly folding
    // the projection — the bucket expression must actually run codegen'd
    val in = vals.map(Option(_).map(_.doubleValue)).toDF("v").repartition(1)
    val out = in.select(toColumn(
      RangeBucket(toExpr(col("v")), bounds)).as("b"))
    assert(out.collect().map(_.getInt(0)).sorted.toSeq ==
      Seq(0, 0, 0, 1, 1, 2, 2, 3, 3, 0).sorted)
    val plan = out.queryExecution.executedPlan.toString
    assert("""\*\(\d+\) Project""".r.findFirstIn(plan).isDefined,
      s"z-value projection fell out of whole-stage codegen:\n$plan")
  }

  test("skewed data still spreads across buckets (quantile boundaries)") {
    // 90% of mass at x=5; equal-width bucketing would collapse the curve
    val skew = (0 until 20000).map { i =>
      val x = if (i % 10 == 0) math.abs(i * 7919) % 1000 else 5
      (i.toLong, x.toLong, (i % 1000).toLong)
    }.toDF("id", "x", "y")
    val zord = ZOrder.layout(skew, Seq("x", "y"), bits = 8, partitions = 4)
    // the y dimension must stay clustered despite x's skew
    val tmp = java.nio.file.Files.createTempDirectory("zskew").toString
    val (touched, total) =
      writeAndCount(s"$tmp/z", zord, col("y").between(0, 19))
    assert(total >= 4)
    assert(touched * 2 < total, s"skew collapsed the curve: $touched of $total")
  }
}
