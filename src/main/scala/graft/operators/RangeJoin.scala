package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: match each left row's long `valueCol` to
  * every right interval `[loCol, hiCol)` — the enrichment shape (value
  * → band, IP → CIDR block, timestamp → maintenance window) that
  * naively plans as a BroadcastNestedLoopJoin with an O(|L|·|R|)
  * theta condition once the interval side outgrows a broadcast.
  *
  * Scale path: BIN the domain at `binWidth`. Each interval explodes to
  * the bins it covers (`sequence` — expansion ≈ interval width /
  * binWidth, choose binWidth near the median width); each left row
  * computes its single bin; the join is then a plain EQUI join on the
  * bin key (broadcast when the exploded dim side is small, shuffled
  * hash join — never nested-loop — beyond), and the exact
  * `lo <= v < hi` predicate filters bin-mates that don't truly
  * overlap. Overlapping intervals yield one output row per match, as
  * a range join should.
  *
  * Arithmetic is floor division (negative-safe), integer end-to-end —
  * bin membership is exact, so no margin bins are needed and the
  * result EQUALS the theta join's row set (RangeJoinSpec pins both
  * the equality and the no-nested-loop plan). */
object RangeJoin {

  /** The bin's START value (a − a mod w, floor semantics — pmod makes
    * it negative-safe): pure integer ops, exact at any long, no
    * division in the key. */
  private def binStart(a: Column, w: Long): Column = a - pmod(a, lit(w))

  /** Inner range join; right columns are all carried. A fresh bin
    * column name is derived, so callers' columns never collide. */
  def binned(left: DataFrame, valueCol: String,
             right: DataFrame, loCol: String, hiCol: String,
             binWidth: Long): DataFrame = {
    require(binWidth >= 1, "binWidth must be >= 1")
    val bin = Iterator.from(0).map(i => s"__bin$i")
      .find(n => !left.columns.contains(n) && !right.columns.contains(n)).get
    // [lo, hi): empty intervals (hi <= lo) cover no bins and are
    // dropped by the where() before they can produce a negative range
    val r = right
      .where(col(hiCol) > col(loCol))
      .withColumn(bin,
        explode(sequence(binStart(col(loCol), binWidth),
          binStart(col(hiCol) - 1, binWidth), lit(binWidth))))
    val l = left.withColumn(bin, binStart(col(valueCol), binWidth))
    l.join(r, bin)
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop(bin)
  }
}
