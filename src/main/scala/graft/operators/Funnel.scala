package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered funnel analysis: for each user, the earliest chain
  * `step₁ → step₂ → … → stepₖ` where each later step happens at or
  * after the previous step's chosen time and within `windowMs` of the
  * FIRST step (the standard product-analytics conversion funnel —
  * Druid deployments run this shape over clickstreams constantly).
  * Semantics: t₁ is pinned to the user's globally earliest step₁
  * event; tᵢ = min ts of stepᵢ events with ts ≥ tᵢ₋₁ and
  * ts < t₁ + windowMs. Given that earliest-first-step anchor, the
  * greedy-earliest choice of each later step is optimal: if any chain
  * completes from t₁, the greedy one does. A user whose only
  * completable chain starts from a LATER step₁ occurrence (outside
  * windowMs of their first) is reported as broken — the standard
  * first-touch funnel convention; multi-anchor retry is a different
  * (and quadratic-prone) semantics this operator deliberately does
  * not implement.
  *
  * Returns one row per user who performed step₁:
  * `(userCol, t1..tk millis, steps_completed)` — later columns NULL
  * once the chain breaks.
  *
  * Scale shape: stage i is `filter(type = stepᵢ)` (pushes to the
  * scan) → join with the stage-(i−1) table on the user key → min
  * aggregate on the SAME key. Every shuffle in the chain is on
  * `userCol`, so Catalyst reuses one hash partitioning across all
  * stages (EnsureRequirements inserts no re-exchange between them),
  * and the per-stage tables only shrink (funnel monotonicity). No
  * window function buffers a user's full event history — a hot user
  * costs their event count in the join, not a one-task sort.
  *
  * Each stage's table feeds TWO consumers (the next stage's match
  * join and the chain-break keep join), so it is [[Materialize]]d
  * once per stage — otherwise Catalyst re-derives the whole upstream
  * lineage per consumer and the step₁ scan runs 2^(k−1)-ish times
  * (the redundant-corpus-scan trap). Stage tables are
  * user-cardinality, far smaller than the event log. */
object Funnel {

  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsMillisCol: String, steps: Seq[String],
             windowMs: Long): DataFrame = {
    require(steps.nonEmpty, "at least one funnel step")
    require(windowMs > 0, "window must be positive")
    val first = Materialize(events.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol))
      .agg(min(col(tsMillisCol)).as("t1")))
    val full = steps.zipWithIndex.tail.foldLeft(first) {
      case (prev0, (step, i)) =>
        val prev = if (i == 1) prev0 else Materialize(prev0)
        val tPrev = s"t$i"
        val tCur = s"t${i + 1}"
        // t1..tPrev are per-user constants here; min re-emits them
        val aggs = (min(col("t1")).as("t1") +:
          (2 to i).map(j => min(col(s"t$j")).as(s"t$j"))) :+
          min(col(tsMillisCol)).as(tCur)
        val matched = events.filter(col(typeCol) === step)
          .join(prev, userCol)
          .where(col(tsMillisCol) >= col(tPrev) &&
            col(tsMillisCol) < col("t1") + windowMs)
          .groupBy(col(userCol))
          .agg(aggs.head, aggs.tail: _*)
        // keep users whose chain broke at this step (left join back)
        prev.join(matched.select(col(userCol).as("__u"), col(tCur)),
            prev(userCol) === col("__u"), "left")
          .drop("__u")
    }
    val stepCols = (1 to steps.size).map(i => col(s"t$i"))
    full.withColumn("steps_completed",
      stepCols.map(c => when(c.isNotNull, 1).otherwise(0)).reduce(_ + _)
        .cast("long"))
  }
}
