package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

class TpchQueriesSpec extends SparkSpec {

  test("q1 groups by returnflag/linestatus with positive sums") {
    val rows = TpchQueries.q1Pricing(spark, sf()).collect()
    assert(rows.nonEmpty)
    val keys = rows.map(r => (r.getString(0), r.getString(1))).toSet
    assert(keys.size == rows.length, "one row per (flag, status)")
    rows.foreach { r =>
      assert(r.getDouble(2) > 0, "sum_qty positive")
      assert(r.getLong(9) > 0, "count_order positive")
    }
  }

  test("q1 totals equal a direct recount") {
    import org.apache.spark.sql.functions._
    val li = graft.Tables.lineitem(spark, sf())
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
    val expected = li.count()
    val got = TpchQueries.q1Pricing(spark, sf())
      .agg(sum("count_order")).collect()(0).getLong(0)
    assert(got == expected)
  }

  test("q3 returns at most 10 rows ordered by revenue desc") {
    val rows = TpchQueries.q3Shipping(spark, sf()).collect()
    assert(rows.length <= 10 && rows.nonEmpty)
    val revs = rows.map(_.getAs[Double]("revenue"))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("q5 and q6 are non-empty") {
    assert(TpchQueries.q5LocalSupplier(spark, sf()).count() > 0)
    val r = TpchQueries.q6Forecast(spark, sf()).collect()
    assert(r.length == 1)
  }

  test("entry smoke: rows > 0") {
    assert(graft.SparkEntry.entry(spark).count() > 0)
  }
}
