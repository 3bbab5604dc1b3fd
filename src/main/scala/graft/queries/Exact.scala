package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic floating aggregates.
  *
  * `sum(double)` is order-dependent, so Spark and a DuckDB oracle can
  * disagree in the last ulp (and, after rounding, at any rounding
  * boundary). Summing through an exact DECIMAL makes the result
  * independent of addition order: double→decimal(38,6) rounding of the
  * same IEEE double is identical in both engines, decimal addition is
  * exact, and the final decimal→double cast is deterministic.
  *
  * Overflow is LOUD, never silent: a non-ANSI decimal cast would turn
  * an overflowing value into NULL (and a downstream coalesce could
  * mask a fully-overflowed sum as 0.0), so values with |v| ≥ 1e32 —
  * beyond DECIMAL(38,6)'s integral range — raise an error, and a sum
  * that nulls out despite non-null inputs (accumulator overflow)
  * raises as well. DuckDB mirrors this: its decimal casts and sums
  * error on overflow natively.
  *
  * Every double-valued aggregate exposed to the driver's hash-compare
  * goes through these (Spark side) and the matching `sql*` strings
  * (DuckDB side).
  */
object Exact {
  private[queries] val Dec = DecimalType(38, 6)
  private val MaxAbs = 1e32 // DECIMAL(38,6) holds ±(10^32 − 10^-6)

  /** Checked DECIMAL(38,6) image of a double expression — the exact,
    * association-independent carrier `dsum` sums. Consumers that must
    * stay exact THROUGH a window frame (e.g. movingAverage trailing
    * sums, where Spark streams frames but DuckDB segment-trees them —
    * different association order) keep this decimal until one final
    * double cast at output. Raises on values outside the decimal's
    * integral range instead of nulling. */
  def dec(c: Column): Column = {
    val d = c.cast("double")
    when(abs(d) >= lit(MaxAbs),
        raise_error(concat(lit("Exact value overflows DECIMAL(38,6): "), d.cast("string"))))
      .otherwise(d.cast(Dec))
  }

  /** Order-independent sum of a double expression, as double.
    * Raises on per-value or accumulator overflow instead of nulling. */
  def dsum(c: Column): Column = {
    val checked = dec(c)
    val s = sum(checked)
    when(count(checked) > 0 && s.isNull,
        raise_error(lit("Exact.dsum accumulator overflowed DECIMAL(38,6)")))
      .otherwise(s)
      .cast("double")
  }

  /** Order-independent mean of a double expression, as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  /** The DuckDB cast routes through VARCHAR deliberately: DuckDB 1.0's
    * direct DECIMAL(38,6)→DOUBLE cast double-rounds (int128→double,
    * then scale division — 1 ulp off at ~1e10 magnitudes, observed at
    * sf1), while string→double parsing is correctly rounded and agrees
    * bit-for-bit with Spark's BigDecimal.doubleValue at any scale. */
  def sqlSum(expr: String): String =
    s"CAST(CAST(sum(CAST($expr AS DECIMAL(38,6))) AS VARCHAR) AS DOUBLE)"

  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / count(*))"
}
