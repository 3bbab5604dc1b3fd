package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Cross-engine-deterministic floating aggregates.
  *
  * `sum(double)` is order-dependent, so Spark and a DuckDB oracle can
  * disagree in the last ulp (and, after rounding, at any rounding
  * boundary). Summing through an exact DECIMAL makes the result
  * independent of addition order: double→decimal(18,6) rounding of the
  * same IEEE double is identical in both engines, decimal addition is
  * exact, and the final decimal→double cast is deterministic.
  *
  * Every double-valued aggregate exposed to the driver's hash-compare
  * goes through these (Spark side) and the matching `sql*` strings
  * (DuckDB side).
  */
object Exact {
  private val Dec = DecimalType(18, 6)

  /** Order-independent sum of a double expression, as double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast("double")

  /** Order-independent mean of a double expression, as double. */
  def davg(c: Column): Column = dsum(c) / count(lit(1))

  def sqlSum(expr: String): String =
    s"CAST(sum(CAST($expr AS DECIMAL(18,6))) AS DOUBLE)"

  def sqlAvg(expr: String): String =
    s"(${sqlSum(expr)} / count(*))"
}
