package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TupleSketchSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("exact regime: distinct keys and per-metric sums are exact") {
    // 300 keys x 4 rows, metrics (k mod 7, 1) — integer-valued doubles
    val df = (0 until 1200).map { i =>
      val k = (i % 300).toLong
      (k, (k % 7).toDouble, 1.0)
    }.toDF("k", "m1", "m2").repartition(11)
    val out = df.agg(TupleSketch.tuple_sketch_agg(col("k"),
        Seq(col("m1"), col("m2")), 4096).as("sk"))
      .select(TupleSketch.tuple_estimate(col("sk")).as("nd"),
        TupleSketch.tuple_metric_sums(col("sk")).as("sums"))
      .head()
    assert(out.getDouble(0) == 300.0)
    val sums = out.getSeq[Double](1)
    assert(sums == Seq((0 until 1200).map(i => ((i % 300) % 7).toDouble).sum, 1200.0))
  }

  test("metric means: per-retained-key averages of the per-key totals") {
    val df = (0 until 1200).map { i =>
      val k = (i % 300).toLong
      (k, (k % 7).toDouble, 1.0)
    }.toDF("k", "m1", "m2").repartition(11)
    val means = df.agg(TupleSketch.tuple_sketch_agg(col("k"),
        Seq(col("m1"), col("m2")), 4096).as("sk"))
      .select(TupleSketch.tuple_metric_means(col("sk")).as("means"))
      .head().getSeq[Double](0)
    // exact regime: one entry per key holding that key's summed values
    val m1 = (0 until 300).map(k => 4.0 * (k % 7)).sum / 300.0
    assert(means == Seq(m1, 4.0))
  }

  test("sketch bytes re-aggregate through the merge path") {
    val df = (0 until 1000).map { i => (s"g${i % 2}", (i % 100).toLong, 1.0) }
      .toDF("g", "k", "m")
    val perGroup = df.groupBy("g")
      .agg(TupleSketch.tuple_sketch_agg(col("k"), Seq(col("m")), 1024).as("sk"))
    val merged = perGroup
      .agg(TupleSketch.tuple_merge_agg(col("sk"), 1, 1024).as("sk"))
      .select(TupleSketch.tuple_estimate(col("sk")).as("nd"),
        element_at(TupleSketch.tuple_metric_sums(col("sk")), 1).as("rows"))
      .head()
    assert(merged.getDouble(0) == 100.0)
    assert(merged.getDouble(1) == 1000.0)
  }

  test("estimate regime: distinct-key and sum estimates stay within 5%") {
    val n = 50000
    val df = (0 until n).map(i => (i.toLong, 1.0)).toDF("k", "m").repartition(16)
    val out = df.agg(TupleSketch.tuple_sketch_agg(col("k"), Seq(col("m")), 4096).as("sk"))
      .select(TupleSketch.tuple_estimate(col("sk")).as("nd"),
        element_at(TupleSketch.tuple_metric_sums(col("sk")), 1).as("sum"))
      .head()
    assert(math.abs(out.getDouble(0) - n) < n * 0.05, s"estimate ${out.getDouble(0)}")
    assert(math.abs(out.getDouble(1) - n) < n * 0.05, s"sum ${out.getDouble(1)}")
  }

  test("null keys skip the row; null metrics count zero") {
    val df = Seq(
      (Some(1L), Some(2.0)), (Some(1L), None), (None, Some(9.0)), (Some(2L), Some(3.0))
    ).toDF("k", "m")
    val out = df.agg(TupleSketch.tuple_sketch_agg(col("k"), Seq(col("m")), 64).as("sk"))
      .select(TupleSketch.tuple_estimate(col("sk")).as("nd"),
        element_at(TupleSketch.tuple_metric_sums(col("sk")), 1).as("sum"))
      .head()
    assert(out.getDouble(0) == 2.0)
    assert(out.getDouble(1) == 5.0)
  }
}
