package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based lookups: the scale path for Druid lookups too big to
  * inline as a map extractionFn. The lookup table is broadcast, so at
  * 100 TB the fact side never shuffles — equivalent semantics to
  * `{"type":"lookup"}` extraction (retainMissingValue /
  * replaceMissingValueWith), different mechanism.
  */
object LookupJoin {

  /** Replace `keyCol` values via `lookupDf(lookupKey → lookupValue)`.
    *
    * @param retainMissing keep the original value when unmatched
    *                      (else `replaceWith`, default null)
    */
  def apply(df: DataFrame, lookupDf: DataFrame,
            keyCol: String, lookupKey: String, lookupValue: String,
            outputName: String, retainMissing: Boolean = true,
            replaceWith: Option[String] = None): DataFrame = {
    val lk = lookupDf.select(
      col(lookupKey).as("__lk_key"), col(lookupValue).as("__lk_val"))
    val joined = df.join(broadcast(lk), col(keyCol) === col("__lk_key"), "left")
    val resolved: Column =
      if (retainMissing) coalesce(col("__lk_val"), col(keyCol))
      else replaceWith match {
        case Some(v) => coalesce(col("__lk_val"), lit(v))
        case None => col("__lk_val")
      }
    joined.withColumn(outputName, resolved).drop("__lk_key", "__lk_val")
  }
}
