package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join — the attribution shape:
  * each click joins to every view by the same user that happened at
  * most `horizon` before it (click-through attribution, impression →
  * conversion matching; the streaming analogue of [[graft.operators
  * .RangeJoin]]'s enrichment and the funnel's step chaining).
  *
  * Spark's stream-stream inner join needs (a) an equality key — the
  * user — and (b) a two-sided event-time bound so both sides' state
  * can be EVICTED at the watermark: a view's state is droppable once
  * the click watermark passes view_ts + horizon, a click's once the
  * view watermark passes click_ts. State is then O(events inside the
  * horizon window), not O(stream) — that is what makes this run
  * forever on an unbounded clickstream at cluster scale.
  *
  * `lateness` is the out-of-orderness bound: events later than it MAY
  * be dropped (standard watermark semantics — the correctness gate
  * runs with lateness covering the staged corpus's full disorder, so
  * its output is the exact batch join; production picks the real
  * disorder bound). */
object StreamJoin {

  /** @param views  streaming (userCol, vtsCol[timestamp]) side
    * @param clicks streaming (userCol, ctsCol[timestamp]) side
    * @param horizon   SQL interval string, max view→click gap
    * @param lateness  watermark horizon for BOTH sides */
  def intervalJoin(views: DataFrame, clicks: DataFrame,
                   userCol: String, vtsCol: String, ctsCol: String,
                   horizon: String, lateness: String): DataFrame = {
    val v = views.select(col(userCol).as("__vu"), col(vtsCol).as(vtsCol))
      .withWatermark(vtsCol, lateness)
    val c = clicks.select(col(userCol).as(userCol), col(ctsCol).as(ctsCol))
      .withWatermark(ctsCol, lateness)
    c.join(v,
        col(userCol) === col("__vu") &&
          col(ctsCol) >= col(vtsCol) &&
          col(ctsCol) <= col(vtsCol) + expr(s"INTERVAL $horizon"))
      .drop("__vu")
  }
}
