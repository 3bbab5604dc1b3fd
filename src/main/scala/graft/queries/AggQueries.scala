package graft.queries

import graft.Tables
import graft.model.Aggregators
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Remaining aggregator-coverage queries: first/last, theta sketches,
  * HLL, multi-value dimensions, quantiles — all through the Druid JSON
  * aggregator dialect where applicable.
  */
object AggQueries {

  private def ev(s: SparkSession, d: String): DataFrame = Tables.events(s, d)

  // -- first/last by __time per day (Druid long/doubleFirst/Last) --

  val firstLastJson: String =
    """[
      |{"type":"doubleFirst","name":"first_value","fieldName":"value"},
      |{"type":"doubleLast","name":"last_value","fieldName":"value"},
      |{"type":"stringFirst","name":"first_type","fieldName":"event_type"},
      |{"type":"longLast","name":"last_user","fieldName":"user_id"}
      |]""".stripMargin

  def aggFirstLast(s: SparkSession, d: String): DataFrame = {
    val df = ev(s, d)
    val aggs = Aggregators.parseAggs(firstLastJson)
      .map(a => Aggregators.compile(a, df.schema, "ts"))
    df.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(aggs.head, aggs.tail: _*)
      .orderBy("day")
  }

  /** Tie-safe mirror of the (time, value) composite ordering the
    * engine uses (DuckDB 1.0's arg_min/arg_max take no composite key):
    * first = MIN value among earliest-ts rows, last = MAX value among
    * latest-ts rows — identical semantics to min_by/max_by on
    * struct(ts, value). arg_min(x, ts) alone is nondeterministic the
    * moment ts has duplicates (it does at sf1: every row has
    * copies × identical timestamps).
    *
    * Boundary timestamps are PER COLUMN over non-null rows: the
    * engine's min_by/max_by skips NULL-valued rows entirely (Druid's
    * first/last null skipping), so first_value is taken at the
    * earliest ts having a non-null `value` — a shared min(ts) over
    * ALL rows would return NULL whenever every row at the global t0
    * has a NULL in that column. */
  val aggFirstLastSql: String =
    """WITH b AS (SELECT date_trunc('day', ts) AS day,
      |    min(ts) FILTER (WHERE value IS NOT NULL) AS t0_value,
      |    max(ts) FILTER (WHERE value IS NOT NULL) AS t1_value,
      |    min(ts) FILTER (WHERE event_type IS NOT NULL) AS t0_type,
      |    max(ts) FILTER (WHERE user_id IS NOT NULL) AS t1_user
      |  FROM events GROUP BY 1)
      |SELECT CAST(b.day AS TIMESTAMP) AS day,
      |  min(e.value) FILTER (WHERE e.ts = b.t0_value) AS first_value,
      |  max(e.value) FILTER (WHERE e.ts = b.t1_value) AS last_value,
      |  min(e.event_type) FILTER (WHERE e.ts = b.t0_type) AS first_type,
      |  max(e.user_id) FILTER (WHERE e.ts = b.t1_user) AS last_user
      |FROM events e JOIN b ON date_trunc('day', e.ts) = b.day
      |GROUP BY b.day ORDER BY 1""".stripMargin

  // -- theta sketch distinct per dimension (exact below k=4096) --

  def aggTheta(s: SparkSession, d: String): DataFrame = {
    val df = ev(s, d)
    val agg = Aggregators.compile(
      Aggregators.parseAggs(
        """{"type":"thetaSketch","name":"n_users","fieldName":"user_id"}""").head,
      df.schema, "ts")
    df.groupBy(col("event_type")).agg(agg).orderBy("event_type")
  }

  val aggThetaSql: String =
    """SELECT event_type, CAST(count(DISTINCT user_id) AS DOUBLE) AS n_users
      |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin

  // -- theta set ops across dimension values (Druid post-agg intersect) --

  /** Distinct users doing BOTH 'click' and 'purchase', per day —
    * theta intersection, the set operation HLL cannot do. Exact below
    * k, so oracle-able against a self-join recompute. */
  def aggThetaSetops(s: SparkSession, d: String): DataFrame = {
    import graft.functions.Sketches._
    val df = ev(s, d)
    df.groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(
        theta_sketch_agg(when(col("event_type") === "click", col("user_id"))).as("clicks"),
        theta_sketch_agg(when(col("event_type") === "purchase", col("user_id"))).as("buys"))
      .select(col("day"),
        theta_estimate(theta_intersect(col("clicks"), col("buys"))).as("both_users"),
        theta_estimate(theta_union(col("clicks"), col("buys"))).as("either_users"),
        theta_estimate(theta_anotb(col("clicks"), col("buys"))).as("click_only_users"))
      .orderBy("day")
  }

  val aggThetaSetopsSql: String =
    """WITH c AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
      |           FROM events WHERE event_type = 'click'),
      |p AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d, user_id
      |      FROM events WHERE event_type = 'purchase'),
      |j AS (SELECT coalesce(c.d, p.d) AS d,
      |        c.user_id IS NOT NULL AS in_c, p.user_id IS NOT NULL AS in_p
      |      FROM c FULL JOIN p ON c.d = p.d AND c.user_id = p.user_id),
      |g AS (SELECT d,
      |        CAST(count(CASE WHEN in_c AND in_p THEN 1 END) AS DOUBLE) AS both_users,
      |        CAST(count(*) AS DOUBLE) AS either_users,
      |        CAST(count(CASE WHEN in_c AND NOT in_p THEN 1 END) AS DOUBLE) AS click_only_users
      |      FROM j GROUP BY d),
      |days AS (SELECT DISTINCT CAST(date_trunc('day', ts) AS TIMESTAMP) AS d FROM events)
      |SELECT days.d AS day,
      |  coalesce(g.both_users, 0.0) AS both_users,
      |  coalesce(g.either_users, 0.0) AS either_users,
      |  coalesce(g.click_only_users, 0.0) AS click_only_users
      |FROM days LEFT JOIN g USING (d) ORDER BY 1""".stripMargin

  // -- frequent items (DataSketches frequencies / heavy hitters) --

  /** Per-day frequent event types via the frequencies sketch. Exact
    * regime (per-day distinct event types fit the 64-slot map), so the
    * sketch's est/lb/ub all equal the true count and the oracle is a
    * plain GROUP BY replay — gating the exactness guarantee itself,
    * not just row shapes. Estimate-regime bounds are spec-tested
    * (FreqSketchSpec). */
  def aggFreqItems(s: SparkSession, d: String): DataFrame = {
    import graft.functions.FreqSketch._
    ev(s, d).groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(freq_sketch_agg(col("event_type"), 64).as("sk"))
      .select(col("day"), explode(freq_items(col("sk"))).as("r"))
      .select(col("day"), col("r.item").as("event_type"),
        col("r.est").as("cnt"), col("r.lb").as("lb"), col("r.ub").as("ub"))
      .orderBy(col("day"), col("cnt").desc, col("event_type"))
  }

  val aggFreqItemsSql: String =
    """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type,
      |  count(*) AS cnt, count(*) AS lb, count(*) AS ub
      |FROM events GROUP BY 1, 2 ORDER BY day, cnt DESC, event_type""".stripMargin

  // -- tuple (ArrayOfDoubles) sketch: distinct keys + keyed metric sums --

  /** Druid `arrayOfDoublesSketch` per event type: distinct users AND
    * per-key-summed metrics from ONE mergeable sketch. Exact regime
    * (distinct users ≪ nominal entries, theta = 1) with integer-valued
    * metric doubles, so the estimate and both sums hash-match a plain
    * SQL recompute; estimate-regime error is spec-tested
    * (TupleSketchSpec). */
  def aggTupleSketch(s: SparkSession, d: String): DataFrame = {
    import graft.functions.TupleSketch
    val withM = ev(s, d)
      .withColumn("m_units", (col("user_id") % 97).cast("double"))
      .withColumn("m_one", lit(1.0))
    val agg = Aggregators.compile(Aggregators.parseAggs(
      """{"type":"arrayOfDoublesSketch","name":"sk","fieldName":"user_id",
        |"metricColumns":["m_units","m_one"],"nominalEntries":4096}""".stripMargin).head,
      withM.schema, "ts", finalize = false)
    withM.groupBy(col("event_type")).agg(agg)
      .select(col("event_type"),
        TupleSketch.tuple_estimate(col("sk")).cast("long").as("n_users"),
        element_at(TupleSketch.tuple_metric_sums(col("sk")), 1)
          .cast("long").as("sum_units"),
        element_at(TupleSketch.tuple_metric_sums(col("sk")), 2)
          .cast("long").as("n_rows"),
        // ToMeans post-agg: per-retained-key mean of per-key totals.
        // Both metrics are integer-valued, so the entry-order double
        // accumulation is exact and the mean is ONE correctly-rounded
        // division — hash-comparable to the SQL replay.
        element_at(TupleSketch.tuple_metric_means(col("sk")), 1)
          .as("mean_units"),
        element_at(TupleSketch.tuple_metric_means(col("sk")), 2)
          .as("mean_rows"))
      .orderBy("event_type")
  }

  val aggTupleSketchSql: String =
    """SELECT event_type, count(DISTINCT user_id) AS n_users,
      |  CAST(sum(user_id % 97) AS BIGINT) AS sum_units, count(*) AS n_rows,
      |  CAST(CAST(sum(user_id % 97) AS BIGINT) AS DOUBLE)
      |    / count(DISTINCT user_id) AS mean_units,
      |  CAST(count(*) AS DOUBLE) / count(DISTINCT user_id) AS mean_rows
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // -- fixed-buckets histogram (Druid histogram extension) --

  /** Equal-width histogram of `value` per event type, overflow outlier
    * mode. Exact-arithmetic aggregate (conditional sums, IEEE bucket
    * math identical in both engines), so every bucket count AND both
    * outlier counters hash-match the SQL replay. */
  def aggHistogram(s: SparkSession, d: String): DataFrame = {
    val spec = Aggregators.parseAggs(
      """{"type":"fixedBucketsHistogram","name":"hist","fieldName":"value",
        |"lowerLimit":50.0,"upperLimit":450.0,"numBuckets":8,
        |"outlierHandlingMode":"overflow"}""".stripMargin).head
    val df = ev(s, d)
    df.groupBy(col("event_type"))
      .agg(Aggregators.compile(spec, df.schema, "ts"))
      .select(col("event_type"), col("hist.lower_out").as("lower_out"),
        col("hist.upper_out").as("upper_out"), posexplode(col("hist.buckets")))
      .select(col("event_type"), col("pos").cast("long").as("bucket"),
        col("col").as("cnt"), col("lower_out"), col("upper_out"))
      .orderBy("event_type", "bucket")
  }

  val aggHistogramSql: String =
    """WITH base AS (
      |  SELECT event_type,
      |    CASE WHEN value < 50.0 OR value > 450.0 THEN NULL
      |         WHEN value = 450.0 THEN 7
      |         ELSE CAST(floor((value - 50.0) / 50.0) AS INT) END AS b,
      |    CASE WHEN value < 50.0 THEN 1 ELSE 0 END AS lo,
      |    CASE WHEN value > 450.0 THEN 1 ELSE 0 END AS hi
      |  FROM events),
      |agg AS (SELECT event_type, CAST(sum(lo) AS BIGINT) AS lower_out,
      |               CAST(sum(hi) AS BIGINT) AS upper_out FROM base GROUP BY 1),
      |cnts AS (SELECT event_type, b, count(*) AS cnt FROM base
      |         WHERE b IS NOT NULL GROUP BY 1, 2),
      |spine AS (SELECT DISTINCT event_type, unnest(range(0, 8)) AS bucket
      |          FROM events)
      |SELECT s.event_type, s.bucket, coalesce(c.cnt, 0) AS cnt,
      |  a.lower_out, a.upper_out
      |FROM spine s JOIN agg a USING (event_type)
      |LEFT JOIN cnts c ON c.event_type = s.event_type AND c.b = s.bucket
      |ORDER BY s.event_type, s.bucket""".stripMargin

  // -- hyperUnique (HLL): algorithm-specific estimate, rows-only --

  def aggHll(s: SparkSession, d: String): DataFrame = {
    val df = ev(s, d)
    val aggs = Aggregators.parseAggs(
      """[{"type":"hyperUnique","name":"approx_users","fieldName":"user_id"},
        |{"type":"cardinality","name":"approx_props","fields":["props"]}]""".stripMargin)
      .map(a => Aggregators.compile(a, df.schema, "ts"))
    df.groupBy(col("event_type")).agg(aggs.head, aggs.tail: _*).orderBy("event_type")
  }

  // -- multi-value dimension groupBy (Druid unnest semantics) --

  /** Derive a 2-value dim (event_type, user bucket) and group by it
    * through the Druid groupBy path — each array value becomes its own
    * group, as in Druid multi-value dimensions. */
  def multiValue(s: SparkSession, d: String): DataFrame = {
    val df = ev(s, d).withColumn("mv",
      array(col("event_type"), concat(lit("u"), pmod(col("user_id"), lit(5)))))
    DruidQueries.run(df, "ts",
      """{
        |  "queryType": "groupBy",
        |  "dimensions": ["mv"],
        |  "granularity": "all",
        |  "aggregations": [
        |    {"type": "count", "name": "cnt"},
        |    {"type": "longSum", "name": "sum_users", "fieldName": "user_id"}
        |  ],
        |  "limitSpec": {"type": "default", "columns": [
        |    {"dimension": "mv", "direction": "ascending"}]}
        |}""".stripMargin)
  }

  val multiValueSql: String =
    """SELECT mv, count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS sum_users
      |FROM (SELECT unnest(list_value(event_type, 'u' || (user_id % 5))) AS mv,
      |             user_id
      |      FROM events)
      |GROUP BY mv ORDER BY mv""".stripMargin

  // -- quantiles: exact interpolated percentiles (cross-checkable) --

  def aggQuantiles(s: SparkSession, d: String): DataFrame = {
    val df = ev(s, d)
    df.groupBy(col("event_type"))
      .agg(
        expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        expr("percentile(value, 0.99)").as("p99"))
      .orderBy("event_type")
  }

  /** NOT quantile_cont: DuckDB interpolates `lo + (hi-lo)·frac` while
    * Spark's Percentile computes `(hi-pos)·vlo + (pos-lo)·vhi` — the
    * two differ in the last ulp at some magnitudes (first observed at
    * sf1: p99 230.53 vs 230.53000000000003). The mirror replays
    * Spark's exact expression order so the gate stays bit-identical
    * at every scale. */
  val aggQuantilesSql: String =
    """WITH s AS (SELECT event_type, value,
      |    row_number() OVER (PARTITION BY event_type ORDER BY value) - 1 AS rn,
      |    count(*) OVER (PARTITION BY event_type) AS n
      |  FROM events),
      |g AS (SELECT DISTINCT event_type, n FROM s),
      |ix AS (SELECT event_type, n, p, p * (n - 1) AS pos,
      |    CAST(floor(p * (n - 1)) AS BIGINT) AS lo,
      |    CAST(ceil(p * (n - 1)) AS BIGINT) AS hi
      |  FROM g, (VALUES (0.5::DOUBLE), (0.95::DOUBLE), (0.99::DOUBLE)) pp(p)),
      |v AS (SELECT i.event_type, i.p, i.pos, i.lo, i.hi,
      |    max(CASE WHEN s.rn = i.lo THEN s.value END) AS vlo,
      |    max(CASE WHEN s.rn = i.hi THEN s.value END) AS vhi
      |  FROM ix i JOIN s ON s.event_type = i.event_type
      |    AND (s.rn = i.lo OR s.rn = i.hi)
      |  GROUP BY 1, 2, 3, 4, 5),
      |q AS (SELECT event_type, p,
      |    CASE WHEN hi = lo OR vhi = vlo THEN vlo
      |         ELSE (hi - pos) * vlo + (pos - lo) * vhi END AS qv
      |  FROM v)
      |SELECT event_type,
      |  max(CASE WHEN p = 0.5 THEN qv END) AS p50,
      |  max(CASE WHEN p = 0.95 THEN qv END) AS p95,
      |  max(CASE WHEN p = 0.99 THEN qv END) AS p99
      |FROM q GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Druid groupBy v2 subtotalsSpec — per-dim subtotal rows + grand
    * total in ONE grouping-sets pass, oracle-matched against DuckDB's
    * GROUPING SETS. */
  def subtotals(s: SparkSession, d: String): DataFrame =
    DruidQueries.run(ev(s, d), "ts",
      """{
        |  "queryType": "groupBy",
        |  "virtualColumns": [
        |    {"name": "bucket", "expression": "cast(user_id % 3 as string)"}],
        |  "dimensions": ["event_type", "bucket"],
        |  "granularity": "all",
        |  "subtotalsSpec": [["event_type"], ["bucket"], []],
        |  "aggregations": [
        |    {"type": "count", "name": "cnt"},
        |    {"type": "longSum", "name": "su", "fieldName": "user_id"}
        |  ],
        |  "limitSpec": {"type": "default", "columns": [
        |    {"dimension": "event_type", "direction": "ascending"},
        |    {"dimension": "bucket", "direction": "ascending"}]}
        |}""".stripMargin)

  val subtotalsSql: String =
    """SELECT event_type, CAST(user_id % 3 AS VARCHAR) AS bucket,
      |  count(*) AS cnt, CAST(sum(user_id) AS BIGINT) AS su
      |FROM events
      |GROUP BY GROUPING SETS ((event_type), (CAST(user_id % 3 AS VARCHAR)), ())
      |ORDER BY event_type ASC NULLS FIRST, bucket ASC NULLS FIRST""".stripMargin

  /** Quantiles via the mergeable KLL sketch — the 100 TB path.
    * q_quantiles (exact `percentile`) is the oracle cross-check but
    * holds every group's values in memory; this is what survives
    * scale: bounded sketch state, map-side partial aggregation, only
    * sketch bytes across the shuffle. Exercised through the Druid JSON
    * dialect (quantilesDoublesSketch + ToQuantile post-aggs, ≙ the
    * reference adapting any AggregatorFactory). Rows-only: sketch
    * quantiles are approximate (rank error pinned in KllSketchSpec). */
  def aggQuantilesSketch(s: SparkSession, d: String): DataFrame =
    DruidQueries.run(ev(s, d), "ts",
      """{
        |  "queryType": "groupBy",
        |  "dimensions": ["event_type"],
        |  "granularity": "all",
        |  "aggregations": [
        |    {"type": "quantilesDoublesSketch", "name": "sk", "fieldName": "value", "k": 128}
        |  ],
        |  "postAggregations": [
        |    {"type": "quantilesDoublesSketchToQuantile", "name": "p50",
        |     "field": {"type": "fieldAccess", "fieldName": "sk"}, "fraction": 0.5},
        |    {"type": "quantilesDoublesSketchToQuantile", "name": "p95",
        |     "field": {"type": "fieldAccess", "fieldName": "sk"}, "fraction": 0.95},
        |    {"type": "quantilesDoublesSketchToQuantile", "name": "p99",
        |     "field": {"type": "fieldAccess", "fieldName": "sk"}, "fraction": 0.99}
        |  ],
        |  "limitSpec": {"type": "default", "columns": [
        |    {"dimension": "event_type", "direction": "ascending"}]}
        |}""".stripMargin)
      .drop("sk")

  // -- filtered aggregator (Druid `filtered` wrapping ANY agg spec) --

  /** Per-day filtered aggregations through the Druid JSON dialect: a
    * selector-guarded doubleSum, a bound-guarded count, and a NESTED
    * filtered spec (conditions AND) wrapping a longMax — the
    * reference's "adapt any AggregatorFactory" contract
    * (druid-pig/udfs/AggregatorFactoryAdapter.java:43-119) realized as
    * guard weaving: non-matching rows contribute NULL inputs, so every
    * sub-aggregator stays one-pass, codegen'd, and partial-agg
    * friendly (no per-row branch duplication, no second scan). */
  def filteredAgg(s: SparkSession, d: String): DataFrame =
    DruidQueries.run(ev(s, d), "ts",
      """{
        |  "queryType": "timeseries",
        |  "granularity": "day",
        |  "aggregations": [
        |    {"type": "count", "name": "cnt"},
        |    {"type": "filtered", "name": "click_value",
        |     "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
        |     "aggregator": {"type": "doubleSum", "name": "x", "fieldName": "value"}},
        |    {"type": "filtered", "name": "heavy_cnt",
        |     "filter": {"type": "bound", "dimension": "user_id", "lower": "500", "ordering": "numeric"},
        |     "aggregator": {"type": "count", "name": "x"}},
        |    {"type": "filtered", "name": "click_heavy_max",
        |     "filter": {"type": "selector", "dimension": "event_type", "value": "click"},
        |     "aggregator": {"type": "filtered", "name": "x",
        |       "filter": {"type": "bound", "dimension": "user_id", "lower": "500", "ordering": "numeric"},
        |       "aggregator": {"type": "longMax", "name": "y", "fieldName": "user_id"}}}
        |  ]
        |}""".stripMargin)

  val filteredAggSql: String =
    s"""SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS __time,
       |  count(*) AS cnt,
       |  CAST(coalesce(sum(CAST(value AS DECIMAL(38,6))) FILTER (WHERE event_type = 'click'), 0) AS DOUBLE) AS click_value,
       |  count(*) FILTER (WHERE user_id >= 500) AS heavy_cnt,
       |  max(user_id) FILTER (WHERE event_type = 'click' AND user_id >= 500) AS click_heavy_max
       |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // -- HLL / cardinality in the coupon-exact regime (oracle-able) --

  /** hyperUnique + cardinality (both byRow modes) over NDV-BOUNDED
    * derivations, so the DataSketches HLL stays in its coupon
    * (LIST/SET) phase where the rounded estimate equals the true
    * distinct count: `user_id % 200` has ≤200 values per group at ANY
    * scale factor, and `props` draws from a fixed 100-value domain.
    * This pins the full plumbing — tuple-key injectivity (byRow),
    * hll_union value-union (byValue), estimate finalization — against
    * a DuckDB COUNT(DISTINCT) oracle, and the bound makes the oracle
    * scale-robust rather than an sf0.01 accident. The estimator at
    * UNBOUNDED cardinality stays covered by q_hll (rows-only) and
    * AggregatorsSpec's error-band tests. */
  def hllExact(s: SparkSession, d: String): DataFrame =
    DruidQueries.run(ev(s, d), "ts",
      """{
        |  "queryType": "groupBy",
        |  "virtualColumns": [
        |    {"name": "u_bucket", "expression": "user_id % 200"}],
        |  "dimensions": ["event_type"],
        |  "granularity": "all",
        |  "aggregations": [
        |    {"type": "hyperUnique", "name": "n_buckets", "fieldName": "u_bucket"},
        |    {"type": "cardinality", "name": "n_pairs", "fields": ["event_type", "props"], "byRow": true},
        |    {"type": "cardinality", "name": "n_values", "fields": ["event_type", "props"], "byRow": false}
        |  ],
        |  "limitSpec": {"type": "default", "columns": [
        |    {"dimension": "event_type", "direction": "ascending"}]}
        |}""".stripMargin)

  /** KLL sketch quantiles in the EXACT regime: per (event_type, user)
    * groups hold ~13 values at ANY scale factor (users scale with SF,
    * events-per-user don't), far below k=128, so the sketch never
    * compacts and getQuantile returns exact order statistics by the
    * inclusive-rank rule — mirrored in SQL as min(value) over
    * cume_dist ≥ q. Pins build/merge/query of the sketch end-to-end;
    * the estimator ABOVE capacity stays covered by q_quantiles_sketch
    * (rows-only) + KllSketchSpec's rank-error bounds. */
  def kllExact(s: SparkSession, d: String): DataFrame = {
    import graft.functions.KllSketch._
    val df = ev(s, d)
    df.groupBy(col("event_type"), col("user_id"))
      .agg(
        kll_quantile(kll_sketch_agg(col("value"), 128), lit(0.5)).as("p50"),
        kll_quantile(kll_sketch_agg(col("value"), 128), lit(0.9)).as("p90"))
      .orderBy("event_type", "user_id")
  }

  val kllExactSql: String =
    """WITH c AS (SELECT event_type, user_id, value,
      |  cume_dist() OVER (PARTITION BY event_type, user_id ORDER BY value) cd
      |  FROM events)
      |SELECT event_type, user_id,
      |  min(value) FILTER (WHERE cd >= 0.5) AS p50,
      |  min(value) FILTER (WHERE cd >= 0.9) AS p90
      |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  val hllExactSql: String =
    """SELECT event_type,
      |  CAST(count(DISTINCT user_id % 200) AS DOUBLE) AS n_buckets,
      |  CAST(count(DISTINCT (event_type, props)) AS DOUBLE) AS n_pairs,
      |  (SELECT CAST(count(DISTINCT v) AS DOUBLE)
      |   FROM (SELECT unnest([e2.event_type, e2.props]) AS v
      |         FROM events e2 WHERE e2.event_type = e.event_type)) AS n_values
      |FROM events e GROUP BY event_type ORDER BY event_type""".stripMargin
}
