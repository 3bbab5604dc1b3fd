package graft.operators

import graft.SparkSpec

class LookupJoinSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private lazy val facts = Seq(
    (1L, "click"), (2L, "view"), (3L, "purchase"), (4L, "unknown_thing"))
    .toDF("id", "event_type")
  private lazy val lk = Seq(
    ("click", "engagement"), ("view", "engagement"), ("purchase", "revenue"))
    .toDF("k", "v")

  test("retainMissingValue keeps unmatched originals") {
    val out = LookupJoin(facts, lk, "event_type", "k", "v", "grp")
      .select("id", "grp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set(
      (1L, "engagement"), (2L, "engagement"), (3L, "revenue"), (4L, "unknown_thing")))
  }

  test("replaceWith substitutes unmatched values") {
    val out = LookupJoin(facts, lk, "event_type", "k", "v", "grp",
      retainMissing = false, replaceWith = Some("other"))
      .select("id", "grp").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out.contains((4L, "other")))
  }

  test("the lookup side is broadcast") {
    val plan = LookupJoin(facts, lk, "event_type", "k", "v", "grp")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      s"expected broadcast join in:\n$plan")
  }
}
