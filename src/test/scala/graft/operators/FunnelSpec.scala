package graft.operators

import graft.SparkSpec

class FunnelSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def run(rows: (Long, String, Long)*) =
    Funnel.funnel(rows.toDF("u", "et", "tm"), "u", "et", "tm",
        Seq("a", "b", "c"), windowMs = 100L)
      .orderBy("u").collect()
      .map(r => (r.getLong(0), r.get(1), r.get(2), r.get(3),
        r.getAs[Long]("steps_completed")))

  test("greedy-earliest chain with window from the first step") {
    val got = run(
      // u1 completes: a@10, b@20 (not b@5 — before a), c@30
      (1L, "b", 5L), (1L, "a", 10L), (1L, "b", 20L), (1L, "c", 30L),
      // u2 breaks at c: c happens outside the window (10+100=110)
      (2L, "a", 10L), (2L, "b", 50L), (2L, "c", 150L),
      // u3 only step a
      (3L, "a", 7L),
      // u4 never does step a — excluded entirely
      (4L, "b", 1L), (4L, "c", 2L))
    assert(got.toSeq == Seq(
      (1L, 10L, 20L, 30L, 3L),
      (2L, 10L, 50L, null, 2L),
      (3L, 7L, null, null, 1L)))
  }

  test("same-timestamp steps chain (ts >= previous, inclusive)") {
    val got = run((1L, "a", 10L), (1L, "b", 10L), (1L, "c", 10L))
    assert(got.toSeq == Seq((1L, 10L, 10L, 10L, 3L)))
  }

  test("greedy choice maximizes completion within the window") {
    // b@90 would leave c@95 in-window; greedy picks b@20 and still
    // completes with c@95 (any completing chain implies greedy does)
    val got = run((1L, "a", 0L), (1L, "b", 20L), (1L, "b", 90L), (1L, "c", 95L))
    assert(got.toSeq == Seq((1L, 0L, 20L, 95L, 3L)))
  }

  test("one event scan per step (stage tables Materialized)") {
    val df = graft.Tables.events(spark, sf())
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("event_type"),
        org.apache.spark.sql.functions.unix_millis(
          org.apache.spark.sql.functions.col("ts")).as("tm"))
    val q = Funnel.funnel(df, "user_id", "event_type", "tm",
      Seq("view", "click", "purchase"), windowMs = 86400000L)
    q.collect()
    // stages 1..k−1 ran eagerly inside Materialize (one scan each,
    // lineage truncated); the final plan holds only the LAST stage's
    // two event scans (match side of step 2 and 3 feed it)
    val plan = q.queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans <= 2,
      s"lineage duplication would re-derive stage aggregates, got $scans scans:\n$plan")
  }
}
