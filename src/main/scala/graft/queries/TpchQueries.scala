package graft.queries

import graft.Tables
import graft.queries.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** TPC-H-style analytics over the driver's synthetic star schema —
  * exercise the scan/agg/join machinery that segment reads feed at scale.
  *
  * Scale notes (100 TB): q1/q6 are single-pass scan-aggs with full
  * predicate pushdown and map-side partial aggregation. Join-side
  * policy: constant-size dims (nation, region, part at fixed card) get
  * an explicit broadcast; anything derived from a fact table (filtered
  * orders, customer at TPC-H scale) gets NO hint — AQE broadcasts it
  * when the runtime size is small and falls back to shuffle joins when
  * it isn't, so the plan survives a 100× scale-up without driver OOM.
  */
object TpchQueries {

  /** Q1: pricing summary. Scan-heavy, one shuffle (groupBy on 2 low-card
    * keys), everything codegen'd. */
  def q1Pricing(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        davg(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSql: String =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  ${sqlAvg("l_extendedprice")} AS avg_price,
       |  ${sqlAvg("l_discount")} AS avg_disc,
       |  count(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Q3: shipping priority — customer ⋈ orders ⋈ lineitem. customer is
    * broadcast into orders; the orders side joins lineitem however AQE
    * decides (it is fact-derived, so no forced broadcast). */
  def q3Shipping(spark: SparkSession, sfDir: String): DataFrame = {
    val cust = Tables.customer(spark, sfDir)
      .filter(col("c_mktsegment") === "BUILDING")
      .select("c_custkey")
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") < lit("1997-06-15").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") > lit("1997-06-15").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // customer and orders both scale with the fact data (customer is
    // billions of rows at 100 TB — a forced broadcast would OOM the
    // driver), so neither gets a hint: AQE picks broadcast when the
    // filtered side turns out small at runtime, shuffle-hash otherwise
    li.join(ord.join(cust, ord("o_custkey") === cust("c_custkey")),
        li("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("l_orderkey"))
      .limit(10)
  }

  val q3ShippingSql: String =
    s"""SELECT l_orderkey, o_orderdate,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem
       |WHERE c_mktsegment = 'BUILDING'
       |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND o_orderdate < TIMESTAMP '1997-06-15'
       |  AND l_shipdate > TIMESTAMP '1997-06-15'
       |GROUP BY l_orderkey, o_orderdate
       |ORDER BY revenue DESC, l_orderkey
       |LIMIT 10""".stripMargin

  /** Q5-style: revenue by nation through the customer→nation→region
    * snowflake. All dimension tables broadcast — the only shuffle is the
    * final nation-level aggregation. */
  def q5LocalSupplier(spark: SparkSession, sfDir: String): DataFrame = {
    val region = Tables.region(spark, sfDir).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, sfDir)
    val cust = Tables.customer(spark, sfDir)
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val li = Tables.lineitem(spark, sfDir)

    // nation/region are true dims (constant size) → broadcast; orders
    // and customer scale with the fact data → no hint, AQE decides
    val dims = cust
      .join(broadcast(nation), cust("c_nationkey") === nation("n_nationkey"))
      .join(broadcast(region), nation("n_regionkey") === region("r_regionkey"))
      .select(col("c_custkey"), col("n_name"))
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(dims, ord("o_custkey") === dims("c_custkey"))
      .groupBy(col("n_name"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy(desc("revenue"), col("n_name"))
  }

  val q5LocalSupplierSql: String =
    s"""SELECT n_name,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
       |FROM customer, orders, lineitem, nation, region
       |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
       |  AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
       |  AND r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate < TIMESTAMP '1997-01-01'
       |GROUP BY n_name
       |ORDER BY revenue DESC, n_name""".stripMargin

  /** Q6: forecasting revenue change — a fully-pushed selective filter +
    * single global agg; no shuffle beyond the final reduce. */
  def q6Forecast(spark: SparkSession, sfDir: String): DataFrame = {
    Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
              col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
              col("l_discount").between(0.05, 0.07) &&
              col("l_quantity") < 24)
      .agg(dsum(col("l_extendedprice") * col("l_discount")).as("revenue"))
  }

  val q6ForecastSql: String =
    s"""SELECT ${sqlSum("l_extendedprice * l_discount")} AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
       |  AND l_shipdate < TIMESTAMP '1997-01-01'
       |  AND l_discount BETWEEN 0.05 AND 0.07
       |  AND l_quantity < 24""".stripMargin

  /** Q4-style: order-priority counts for orders with at least one
    * late-shipped lineitem — EXISTS compiled to a left-semi join (no
    * duplicate inflation, no distinct). */
  def q4Priority(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
    val lateKeys = Tables.lineitem(spark, sfDir)
      .select(col("l_orderkey"), col("l_shipdate"))
    ord.join(lateKeys, ord("o_orderkey") === lateKeys("l_orderkey") &&
        lateKeys("l_shipdate") > ord("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PrioritySql: String =
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1996-07-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q10-style: top 20 customers by revenue in a quarter — fact joins
    * broadcast dims, TakeOrderedAndProject for the top-k. */
  def q10TopCustomers(spark: SparkSession, sfDir: String): DataFrame = {
    val ord = Tables.orders(spark, sfDir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, sfDir)
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val cust = Tables.customer(spark, sfDir)
    val nat = Tables.nation(spark, sfDir)
    // orders and customer are fact-scaled (customer grows with SF, not
    // a constant-size dim): no broadcast hints — AQE decides from the
    // runtime sizes; only nation is a true dim
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .groupBy(col("o_custkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"))
      .join(cust, col("o_custkey") === cust("c_custkey"))
      .join(broadcast(nat), cust("c_nationkey") === nat("n_nationkey"))
      .select(col("c_custkey"), col("c_name"), col("n_name"), col("c_acctbal"), col("revenue"))
      .orderBy(desc("revenue"), col("c_custkey"))
      .limit(20)
  }

  val q10TopCustomersSql: String =
    s"""SELECT c_custkey, c_name, n_name, c_acctbal, revenue FROM (
       |  SELECT o_custkey, ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue
       |  FROM lineitem, orders
       |  WHERE l_orderkey = o_orderkey
       |    AND o_orderdate >= TIMESTAMP '1996-01-01'
       |    AND o_orderdate < TIMESTAMP '1996-04-01'
       |  GROUP BY o_custkey) r, customer, nation
       |WHERE o_custkey = c_custkey AND c_nationkey = n_nationkey
       |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin

  /** Q19-style: disjunctive brand/size/quantity predicates — pushed
    * into the broadcast-joined scan as one OR-of-ANDs condition. */
  def q19Discounted(spark: SparkSession, sfDir: String): DataFrame = {
    val part = Tables.part(spark, sfDir)
    val li = Tables.lineitem(spark, sfDir)
    li.join(broadcast(part), li("l_partkey") === part("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 15) &&
          col("l_quantity").between(1, 11)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(1, 25) &&
          col("l_quantity").between(10, 20)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35) &&
          col("l_quantity").between(20, 30)))
      .agg(
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
  }

  /** Q12-style late-shipment counts by order priority (the schema has
    * no shipmode/commitdate, so "late" = shipped > 90 days after the
    * order date — same join + conditional-aggregation plan shape).
    * lineitem ⋈ orders is fact ⋈ fact: NO broadcast hint, the shuffle
    * join co-partitions both sides on the order key. */
  def q12Shipmode(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(
        sum(when(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
          1L).otherwise(0L)).as("late_lines"),
        count(lit(1)).as("all_lines"))
      .orderBy(col("o_orderpriority"))
  }

  val q12ShipmodeSql: String =
    """SELECT o_orderpriority,
      |  CAST(sum(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
      |                THEN 1 ELSE 0 END) AS BIGINT) AS late_lines,
      |  count(*) AS all_lines
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Q14: promo revenue share for one ship month. part is a constant-
    * cardinality dim → explicit broadcast; the share is ONE double
    * division over two decimal-exact sums (correctly rounded, so the
    * cross-engine hash covers the percentage too). */
  def q14Promo(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
    val pt = Tables.part(spark, sfDir)
    val rev = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
      .agg(
        dsum(when(col("p_type").startsWith("PROMO"), rev).otherwise(lit(0.0)))
          .as("promo_rev"),
        dsum(rev).as("total_rev"))
      .withColumn("promo_share",
        lit(100.0) * col("promo_rev") / col("total_rev"))
  }

  val q14PromoSql: String =
    s"""WITH a AS (SELECT
       |  ${sqlSum("CASE WHEN p_type LIKE 'PROMO%' THEN l_extendedprice * (1 - l_discount) ELSE 0 END")} AS promo_rev,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS total_rev
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-03-01'
       |  AND l_shipdate < TIMESTAMP '1996-04-01')
       |SELECT promo_rev, total_rev,
       |  100.0 * promo_rev / total_rev AS promo_share FROM a""".stripMargin

  /** Q17: small-quantity-order revenue — lineitem against ITS OWN
    * per-part average. The avg table is fact-derived (one row per
    * part): no broadcast hint, AQE decides; the join is partkey-keyed
    * both sides. avg is exact decimal; the 0.2× threshold compare and
    * final /7.0 are correctly-rounded double ops. */
  def q17SmallQty(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val avgQty = li.groupBy(col("l_partkey").as("a_partkey"))
      .agg(davg(col("l_quantity")).as("avg_qty"))
    val pt = Tables.part(spark, sfDir).filter(col("p_brand") === "Brand#1")
    li.join(broadcast(pt), li("l_partkey") === pt("p_partkey"))
      .join(avgQty, col("l_partkey") === col("a_partkey"))
      .filter(col("l_quantity") < lit(0.2) * col("avg_qty"))
      .agg((dsum(col("l_extendedprice")) / lit(7.0)).as("avg_yearly"),
        count(lit(1)).as("n_lines"))
  }

  val q17SmallQtySql: String =
    s"""WITH a AS (SELECT l_partkey AS a_partkey,
       |    ${sqlAvg("l_quantity")} AS avg_qty FROM lineitem GROUP BY 1)
       |SELECT ${sqlSum("l_extendedprice")} / 7.0 AS avg_yearly,
       |  count(*) AS n_lines
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |  JOIN a ON l_partkey = a_partkey
       |WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty""".stripMargin

  /** Q18: large-volume customers — orders whose total quantity exceeds
    * the threshold, joined back to customer. The qualifying-orders set
    * is a fact aggregate (no hint, AQE); customer joins broadcast only
    * if runtime-small. Top 10 by (totalprice desc, orderkey asc) —
    * total order + tiebreak ⇒ deterministic hash. */
  def q18LargeOrders(spark: SparkSession, sfDir: String): DataFrame = {
    val li = Tables.lineitem(spark, sfDir)
    val o = Tables.orders(spark, sfDir)
    val c = Tables.customer(spark, sfDir)
    val big = li.groupBy(col("l_orderkey"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .filter(col("sum_qty") > 150.0)
    o.join(big, o("o_orderkey") === big("l_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        unix_millis(col("o_orderdate")).as("o_date"),
        col("o_totalprice"), col("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)
  }

  val q18LargeOrdersSql: String =
    s"""WITH big AS (SELECT l_orderkey, ${sqlSum("l_quantity")} AS sum_qty
       |  FROM lineitem GROUP BY 1 HAVING ${sqlSum("l_quantity")} > 150.0)
       |SELECT c_name, c_custkey, o_orderkey,
       |  epoch_ms(o_orderdate) AS o_date, o_totalprice, sum_qty
       |FROM orders JOIN big ON o_orderkey = l_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin

  val q19DiscountedSql: String =
    s"""SELECT ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  count(*) AS n_lines
       |FROM lineitem, part
       |WHERE l_partkey = p_partkey AND (
       |  (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11) OR
       |  (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 25 AND l_quantity BETWEEN 10 AND 20) OR
       |  (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 35 AND l_quantity BETWEEN 20 AND 30))""".stripMargin
}
