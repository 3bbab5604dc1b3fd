package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("binned result equals the theta join, overlaps and negatives included") {
    val left = Seq(-70L, -64L, -1L, 0L, 5L, 31L, 32L, 99L, 100L, 1000L)
      .toDF("v")
    val right = Seq(
      (1L, -100L, -60L), (2L, -5L, 6L), (3L, 0L, 33L), (4L, 30L, 101L),
      (5L, 90L, 90L) // empty interval matches nothing
    ).toDF("rid", "lo", "hi")
    val got = RangeJoin.binned(left, "v", right, "lo", "hi", binWidth = 32)
      .select("v", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val theta = left.join(right, $"v" >= $"lo" && $"v" < $"hi")
      .select("v", "rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == theta)
    assert(theta.contains((5L, 2L)) && theta.contains((5L, 3L)),
      "overlap case must multi-match")
    assert(theta.exists(_._1 == -70L), "negative-domain interval must match")
  }

  test("bin boundaries: values at exact bin and interval edges") {
    val left = Seq(31L, 32L, 33L, 63L, 64L).toDF("v")
    val right = Seq((1L, 32L, 64L)).toDF("rid", "lo", "hi")
    val got = RangeJoin.binned(left, "v", right, "lo", "hi", binWidth = 32)
      .select("v").collect().map(_.getLong(0)).toSet
    assert(got == Set(32L, 33L, 63L))
  }

  test("plans as an equi join — no nested-loop") {
    val left = spark.range(100).select($"id".as("v"))
    val right = spark.range(10).select($"id".as("rid"),
      ($"id" * 10).as("lo"), ($"id" * 10 + 15).as("hi"))
    val plan = RangeJoin.binned(left, "v", right, "lo", "hi", binWidth = 16)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
  }
}
