package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time ("as-of") join: for every left row, attach the single
  * most recent right row at or before the left row's time, per key —
  * the lookup a training pipeline needs for feature/metadata joins
  * with point-in-time correctness (no future leakage).
  *
  * Spark-first shape: UNION-TAG + ONE WINDOW PASS, not a range join.
  * Left probes and right states are unioned into one stream tagged by
  * side, hash-partitioned by key, sorted by (time, side), and each
  * payload column is carried forward with `last(_, ignoreNulls)` over
  * an unbounded-preceding window. Cost: ONE shuffle on the key + one
  * sort — no key×key range cross-product (a naive `l.ts >= r.ts` theta
  * join is O(|L|·|R|) per key and unusable at 100 TB), no per-key
  * broadcast, and AQE-compatible. Right rows sort BEFORE left rows at
  * equal times, so a state timestamped exactly at the probe time IS
  * visible (inclusive semantics, matching DuckDB's `ASOF JOIN ON
  * l.t >= r.t`).
  *
  * Scale note: the shuffle partitions by `keys` alone, so a single
  * mega-key concentrates in one task — same skew surface as any
  * window function. For bounded-history keys that's the right trade;
  * for adversarial skew, pre-aggregate the right side per (key, time)
  * (q_asof does) and/or time-bucket the key.
  *
  * Right-side rows must be unique per (keys, timeCol) — equal-time
  * duplicates would make "the" most recent row ambiguous (and any
  * engine's pick nondeterministic). Callers aggregate duplicates away
  * first; `backward` asserts nothing and simply takes the last in sort
  * order, which equal-time duplicates make undefined.
  */
object AsofJoin {

  /** Backward as-of join.
    *
    * @param left      probe side; all its columns are kept
    * @param right     state side; only `keys`, `rightTime`, `payload` used
    * @param keys      equi-join key columns (same names both sides)
    * @param leftTime  event-time column on `left`
    * @param rightTime event-time column on `right`
    * @param payload   right columns to attach (null when no prior state)
    * @param toleranceMillis if set, a matched state older than this is
    *                  nulled out (DuckDB mirror: an extra time bound)
    * @param dedupRight when true, equal-(keys, time) right rows are
    *                  first reduced to ONE deterministic representative
    *                  (the lexicographically greatest payload tuple) —
    *                  otherwise duplicates make "the" most recent state
    *                  ambiguous and the result partition-order-
    *                  dependent. Doubles as the documented skew
    *                  mitigation: the pre-aggregate shrinks a hot key's
    *                  state stream before the window sort sees it.
    * @return left rows + payload columns + `__asof_time` (the matched
    *         right timestamp, null when unmatched)
    */
  def backward(
      left: DataFrame, right0: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String, payload: Seq[String],
      toleranceMillis: Option[Long] = None,
      dedupRight: Boolean = false): DataFrame = {
    val right = if (!dedupRight) right0 else
      right0.groupBy((keys :+ rightTime).map(col): _*)
        .agg(max(struct(payload.map(col): _*)).as("__p"))
        .select((keys.map(col) :+ col(rightTime)) ++
          payload.map(p => col(s"__p.$p").as(p)): _*)
    val leftCols = left.columns.toSeq
    // every internal plumbing name: a left/payload column with one of
    // these names would be silently clobbered by withColumn, corrupting
    // the union/window bookkeeping rather than failing loudly
    val reserved = Seq("__asof_time", "__t", "__side", "__state", "__match")
    require(leftCols.intersect(reserved).isEmpty,
      s"left columns collide with reserved internal names: " +
        leftCols.intersect(reserved).mkString(", "))
    require(payload.intersect(reserved).isEmpty,
      s"payload columns collide with reserved internal names: " +
        payload.intersect(reserved).mkString(", "))
    // the matched-state struct carries the right time under field "t";
    // a payload column of that name would duplicate the field
    require(!payload.contains("t"),
      "payload column name 't' collides with the state struct's time field")
    require(payload.forall(!leftCols.contains(_)),
      s"payload columns must not clash with left columns: " +
        payload.filter(leftCols.contains).mkString(", "))

    // the matched right row travels as ONE struct: `last(_, ignoreNulls)`
    // then skips only non-state rows, never a state whose payload FIELD
    // is null — carrying payload columns individually would slide a
    // null-valued field past its own row to an older state's value,
    // producing a payload inconsistent with __asof_time (and with SQL
    // ASOF semantics).
    val stateType = org.apache.spark.sql.types.StructType(
      org.apache.spark.sql.types.StructField("t", right.schema(rightTime).dataType) +:
        payload.map(p => org.apache.spark.sql.types.StructField(
          p, right.schema(p).dataType)))
    val l = left
      .withColumn("__t", col(leftTime))
      .withColumn("__side", lit(1))
      .withColumn("__state", lit(null).cast(stateType))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side") :+ col("__state")) ++
          leftCols.filterNot(keys.contains).map(col): _*)
    // SQL equality never matches NULL keys: null-key states must not be
    // visible to anyone (window partitioning WOULD group them with
    // null-key probes) — drop them at the source; null-key probes then
    // sit in a state-free partition and get nulls, as the oracle does
    val r = right
      .filter(keys.map(col(_).isNotNull).reduce(_ && _))
      .withColumn("__t", col(rightTime))
      .withColumn("__side", lit(0))
      .withColumn("__state",
        struct(col(rightTime).as("t") +: payload.map(col): _*))
      .select(
        (keys.map(col) :+ col("__t") :+ col("__side") :+ col("__state")) ++
          leftCols.filterNot(keys.contains)
            .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("__t").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__state"), ignoreNulls = true).over(w))
      .withColumn("__asof_time", col("__match.t"))
    val attached = payload.foldLeft(carried) { (d, p) =>
      d.withColumn(p, col(s"__match.$p"))
    }

    // tolerance must work for TIMESTAMP time columns and for numeric
    // epoch-millis columns alike — unix_millis on a LONG column is an
    // analysis error, so numeric types pass through as millis directly
    def asMillis(c: Column, dt: org.apache.spark.sql.types.DataType): Column = dt match {
      case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType => c.cast("long")
      case _ => unix_millis(c)
    }
    val withTolerance = toleranceMillis match {
      case None => attached
      case Some(tol) =>
        val stale = col("__asof_time").isNull ||
          asMillis(col("__t"), left.schema(leftTime).dataType) -
            asMillis(col("__asof_time"), right.schema(rightTime).dataType) > tol
        payload.foldLeft(
          attached.withColumn("__asof_time",
            when(stale, lit(null)).otherwise(col("__asof_time")))) { (d, p) =>
          d.withColumn(p, when(stale, lit(null)).otherwise(col(p)))
        }
    }

    withTolerance
      .filter(col("__side") === 1)
      .select((keys ++ leftCols.filterNot(keys.contains) ++
        payload :+ "__asof_time").map(col): _*)
  }
}
