package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(ms: Long) = new java.sql.Timestamp(ms)

  test("backward: most recent state at or before the probe, per key") {
    val left = Seq(
      (1L, ts(100), "p1"), (1L, ts(250), "p2"), (1L, ts(50), "p0"),
      (2L, ts(100), "p3")).toDF("k", "t", "probe")
    val right = Seq(
      (1L, ts(100), 10.0), (1L, ts(200), 20.0),
      (3L, ts(50), 99.0)).toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("probe", "v", "__asof_time")
      .collect().map(r => r.getString(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

    assert(out("p0") == ((None, None)), "probe before any state → null")
    assert(out("p1") == ((Some(10.0), Some(ts(100)))), "equal-time state IS visible (inclusive)")
    assert(out("p2") == ((Some(20.0), Some(ts(200)))), "latest prior state wins")
    assert(out("p3") == ((None, None)), "key with no states → null")
  }

  test("backward: tolerance nulls out stale matches") {
    val left = Seq((1L, ts(1000), "near"), (1L, ts(5000), "far")).toDF("k", "t", "probe")
    val right = Seq((1L, ts(900), 1.0)).toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
        toleranceMillis = Some(500L))
      .select("probe", "v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("near") == Some(1.0), "100ms-old state within 500ms tolerance")
    assert(out("far").isEmpty, "4100ms-old state beyond tolerance → null")
  }

  test("backward: dedupRight resolves duplicate (key, time) states deterministically") {
    // two states at the identical (key, time): without dedup the pick
    // is partition-order-dependent; dedupRight keeps the
    // lexicographically greatest payload tuple — stable across runs
    val left = Seq((1L, ts(200), "p")).toDF("k", "t", "probe")
    val right = Seq(
      (1L, ts(100), 5.0, "a"), (1L, ts(100), 7.0, "b"), (1L, ts(100), 7.0, "a"))
      .toDF("k", "t", "v", "tag")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v", "tag"),
        dedupRight = true)
      .select("v", "tag").collect()
    assert(out.length == 1 && out(0).getDouble(0) == 7.0 && out(0).getString(1) == "b")
    // and repeated evaluation with shuffled input order agrees
    val out2 = AsofJoin.backward(left, right.repartition(7), Seq("k"), "t", "t",
        Seq("v", "tag"), dedupRight = true)
      .select("v", "tag").collect()
    assert(out2.length == 1 && out2(0).getDouble(0) == 7.0 && out2(0).getString(1) == "b")
  }

  test("backward: internal-name collisions are rejected loudly") {
    val left = Seq((1L, ts(100), 1)).toDF("k", "t", "__side")
    val right = Seq((1L, ts(50), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
    }
    val left2 = Seq((1L, ts(100), "p")).toDF("k", "t", "probe")
    val right2 = Seq((1L, ts(50), 1.0)).toDF("k", "t", "v")
    intercept[IllegalArgumentException] {
      // payload named "t" collides with the state struct's time field
      AsofJoin.backward(left2, right2, Seq("k"), "t", "t", Seq("t"))
    }
    intercept[IllegalArgumentException] {
      // reserved payload name
      AsofJoin.backward(left2, right2.withColumnRenamed("v", "__match"),
        Seq("k"), "t", "t", Seq("__match"))
    }
  }

  test("backward: tolerance works on epoch-long time columns") {
    val left = Seq((1L, 1000L, "near"), (1L, 5000L, "far")).toDF("k", "t", "probe")
    val right = Seq((1L, 900L, 1.0)).toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"),
        toleranceMillis = Some(500L))
      .select("probe", "v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("near") == Some(1.0))
    assert(out("far").isEmpty)
  }

  test("backward: a matched state with a NULL payload field stays NULL (not slid to an older state)") {
    val left = Seq((1L, ts(300), "p")).toDF("k", "t", "probe")
    val right = Seq(
      (1L, ts(100), Some(10.0)),
      (1L, ts(200), None: Option[Double])).toDF("k", "t", "v")
    val row = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("v", "__asof_time").collect()(0)
    assert(row.isNullAt(0), "the t=200 state's null v must win, not t=100's 10.0")
    assert(row.getTimestamp(1) == ts(200), "__asof_time must be the matched state's time")
  }

  test("backward: NULL keys never match (SQL equality semantics)") {
    val left = Seq((None: Option[Long], ts(200), "pnull"), (Some(1L), ts(200), "p1"))
      .toDF("k", "t", "probe")
    val right = Seq((None: Option[Long], ts(100), 1.0), (Some(1L), ts(100), 2.0))
      .toDF("k", "t", "v")
    val out = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .select("probe", "v").collect()
      .map(r => r.getString(0) -> Option(r.get(1))).toMap
    assert(out("pnull").isEmpty, "null-key probe must not see null-key states")
    assert(out("p1") == Some(2.0))
  }

  test("backward plans exactly one shuffle (union-tag, not a range join)") {
    val left = Seq((1L, ts(100), "p")).toDF("k", "t", "probe")
    val right = Seq((1L, ts(50), 1.0)).toDF("k", "t", "v")
    val plan = AsofJoin.backward(left, right, Seq("k"), "t", "t", Seq("v"))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"expected exactly 1 hash exchange, got $shuffles:\n$plan")
    assert(!plan.contains("CartesianProduct") && !plan.contains("BroadcastNestedLoopJoin"),
      "must not plan a range/theta join")
  }
}
