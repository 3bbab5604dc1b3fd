package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SketchesSpec extends SparkSpec {

  test("theta estimate is close to exact distinct count") {
    val s = spark
    import s.implicits._
    val n = 100000
    val df = (1 to n).map(i => i % 37000).toDF("v")
    val est = df.agg(Sketches.theta_estimate(Sketches.theta_sketch_agg($"v")).as("e"))
      .collect()(0).getDouble(0)
    assert(math.abs(est - 37000) / 37000.0 < 0.05, s"estimate $est vs 37000")
  }

  test("theta estimate is exact below nominal entries") {
    val s = spark
    import s.implicits._
    val df = (1 to 1000).toDF("v")
    val est = df.agg(Sketches.theta_estimate(Sketches.theta_sketch_agg($"v")).as("e"))
      .collect()(0).getDouble(0)
    assert(est == 1000.0)
  }

  test("theta set ops: union / intersection / difference") {
    val s = spark
    import s.implicits._
    // A = 1..1000, B = 500..1500 (overlap 501)
    val df = (1 to 1500).map(i => (i, if (i <= 1000) "a" else "x", if (i >= 500) "b" else "x"))
      .toDF("v", "ga", "gb")
    val sketches = df.agg(
      Sketches.theta_sketch_agg(when($"ga" === "a", $"v")).as("sa"),
      Sketches.theta_sketch_agg(when($"gb" === "b", $"v")).as("sb"))
    val row = sketches.select(
      Sketches.theta_estimate(Sketches.theta_union($"sa", $"sb")).as("u"),
      Sketches.theta_estimate(Sketches.theta_intersect($"sa", $"sb")).as("i"),
      Sketches.theta_estimate(Sketches.theta_anotb($"sa", $"sb")).as("d"))
      .collect()(0)
    assert(row.getDouble(0) == 1500.0, "union")
    assert(row.getDouble(1) == 501.0, "intersection")
    assert(row.getDouble(2) == 499.0, "a-not-b")
  }

  test("sketch bytes re-aggregate: per-group union equals global estimate") {
    val s = spark
    import s.implicits._
    val df = (1 to 10000).map(i => (i % 10, i % 4096)).toDF("g", "v")
    val perGroup = df.groupBy($"g").agg(Sketches.theta_sketch_agg($"v").as("sk"))
    val reagg = perGroup.agg(
      Sketches.theta_estimate(Sketches.theta_sketch_agg($"sk")).as("e"))
      .collect()(0).getDouble(0)
    assert(reagg == 4096.0, s"re-aggregated estimate $reagg")
  }
}
