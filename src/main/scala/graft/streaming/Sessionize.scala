package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Gap-based sessionization with custom streaming state
  * (`flatMapGroupsWithState`) — the arbitrary-state counterpart to the
  * windowed rollup: a session closes when `gap` passes with no
  * activity for the key.
  *
  * State is one open session per key — O(active keys). Sessions close
  * either in-batch (a later event arrives beyond the gap) or by
  * event-time timeout once the watermark passes `last + gap`, so
  * emission is exactly-once per session under Append mode.
  */
object Sessionize {

  /** Batch sessionization over a static table — same gap semantics as
    * the streaming path, expressed with window functions so it is
    * DuckDB-oracle-checkable: a session starts where the gap from the
    * previous event (per user) exceeds `gapMs`; the session id is the
    * running count of starts. RANGE-framed cumulative sum gives
    * timestamp ties identical session ids in both engines, so results
    * are deterministic under any tie order. One shuffle (partition by
    * user), no state. */
  def batchSessions(df: DataFrame, userCol: String, timeCol: String,
                    gapMs: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(userCol)).orderBy(col(timeCol))
    val ms = unix_millis(col(timeCol))
    val flagged = df.withColumn("__new",
      when(lag(col(timeCol), 1).over(w).isNull ||
           ms - unix_millis(lag(col(timeCol), 1).over(w)) > gapMs, 1L)
        .otherwise(0L))
    val wRange = Window.partitionBy(col(userCol)).orderBy(col(timeCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    flagged.withColumn("__session", sum(col("__new")).over(wRange))
      .groupBy(col(userCol), col("__session"))
      .agg(
        unix_millis(min(col(timeCol))).as("session_start_ms"),
        unix_millis(max(col(timeCol))).as("session_end_ms"),
        count(lit(1)).as("n_events"))
      .drop("__session")
  }

  final case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class OpenSession(start_ms: Long, last_ms: Long, n_events: Long, sum_value: Double)
  final case class Session(user_id: Long, session_start_ms: Long, session_end_ms: Long,
                           n_events: Long, sum_value: Double)

  /** @param df needs (user_id long, ts timestamp, value double);
    *        must be a streaming DataFrame.
    * @param gapMs session gap; @param lateness watermark delay. */
  def sessions(df: DataFrame, gapMs: Long, lateness: String = "0 seconds"): Dataset[Session] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.withWatermark("ts", lateness)
      .select(col("user_id").cast("long"), col("ts"),
        col("value").cast("double"))
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, Session](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, events: Iterator[Event], state: GroupState[OpenSession]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap: close and emit the open session
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start_ms, s.last_ms, s.n_events, s.sum_value))
          } else {
            val sorted = events.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption
            val closed = Seq.newBuilder[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.last_ms <= gapMs =>
                  open = Some(OpenSession(s.start_ms, t, s.n_events + 1,
                    s.sum_value + e.value))
                case Some(s) =>
                  closed += Session(user, s.start_ms, s.last_ms, s.n_events, s.sum_value)
                  open = Some(OpenSession(t, t, 1L, e.value))
                case None =>
                  open = Some(OpenSession(t, t, 1L, e.value))
              }
            }
            open.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last_ms + gapMs)
            }
            closed.result().iterator
          }
      }
  }
}
