package graft

import graft.queries.TpchQueries
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    TpchQueries.q1Pricing(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> (TpchQueries.q1Pricing _),
    "q3_shipping" -> (TpchQueries.q3Shipping _),
    "q5_local_supplier" -> (TpchQueries.q5LocalSupplier _),
    "q6_forecast" -> (TpchQueries.q6Forecast _),
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Map(
    "q1_pricing" -> TpchQueries.q1PricingSql,
    "q3_shipping" -> TpchQueries.q3ShippingSql,
    "q5_local_supplier" -> TpchQueries.q5LocalSupplierSql,
    "q6_forecast" -> TpchQueries.q6ForecastSql,
  )
}
