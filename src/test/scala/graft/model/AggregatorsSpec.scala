package graft.model

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AggregatorsSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private lazy val ev = Tables.events(spark, sf())

  private def runAggs(json: String): org.apache.spark.sql.Row = {
    val aggs = Aggregators.parseAggs(json).map(a =>
      Aggregators.compile(a, ev.schema, timeCol = "ts"))
    ev.agg(aggs.head, aggs.tail: _*).collect()(0)
  }

  test("basic sums / min / max / count match direct computation") {
    val row = runAggs(
      """[
        |{"type":"count","name":"cnt"},
        |{"type":"longSum","name":"su","fieldName":"user_id"},
        |{"type":"doubleSum","name":"sv","fieldName":"value"},
        |{"type":"doubleMin","name":"mn","fieldName":"value"},
        |{"type":"doubleMax","name":"mx","fieldName":"value"},
        |{"type":"longMin","name":"idmn","fieldName":"event_id"}
        |]""".stripMargin)
    val direct = ev.agg(
      count(lit(1)), sum($"user_id"), min($"value"), max($"value"), min($"event_id")).collect()(0)
    assert(row.getLong(0) == direct.getLong(0))
    assert(row.getLong(1) == direct.getLong(1))
    assert(row.getDouble(3) == direct.getDouble(2))
    assert(row.getDouble(4) == direct.getDouble(3))
    assert(row.getLong(5) == direct.getLong(4))
  }

  test("first/last by time") {
    val row = runAggs(
      """[
        |{"type":"doubleFirst","name":"fv","fieldName":"value"},
        |{"type":"doubleLast","name":"lv","fieldName":"value"},
        |{"type":"stringFirst","name":"ft","fieldName":"event_type"}
        |]""".stripMargin)
    val byTime = ev.orderBy($"ts").select($"value", $"event_type").collect()
    assert(row.getDouble(0) == byTime.head.getDouble(0))
    assert(row.getDouble(1) == byTime.last.getDouble(0))
    assert(row.getString(2) == byTime.head.getString(1))
  }

  test("first/last tie-break on duplicate timestamps is deterministic (time, value)") {
    // replicated data (the sf1 shape: copies × identical ts) must give
    // the same first/last under ANY partitioning: first = min value at
    // the earliest ts, last = max value at the latest ts
    val df = Seq(
      (1000L, 5.0, "b", 13542L), (1000L, 3.0, "a", 42L),
      (2000L, 9.0, "d", 7L), (2000L, 7.0, "c", 99L)
    ).toDF("ts", "value", "event_type", "user_id")
      .select(timestamp_micros($"ts").as("ts"), $"value", $"event_type", $"user_id")
      .repartition(8)
    val aggs = Aggregators.parseAggs(
      """[
        |{"type":"doubleFirst","name":"fv","fieldName":"value"},
        |{"type":"doubleLast","name":"lv","fieldName":"value"},
        |{"type":"stringFirst","name":"ft","fieldName":"event_type"},
        |{"type":"longLast","name":"lu","fieldName":"user_id"}
        |]""".stripMargin).map(a => Aggregators.compile(a, df.schema, "ts"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    assert(row.getDouble(0) == 3.0)   // min value at earliest ts
    assert(row.getDouble(1) == 9.0)   // max value at latest ts
    assert(row.getString(2) == "a")
    assert(row.getLong(3) == 99L)
  }

  test("first/last skip NULL-valued rows (never let a null win a time tie)") {
    // (t0, null) ties (t0, 5.0): the null row must be ignored — struct
    // ordering would otherwise sort the null field FIRST and hand
    // first_value a null the SQL mirror's min(...) FILTER skips
    val df = Seq(
      (1000L, Option.empty[Double]), (1000L, Some(5.0)), (2000L, Some(2.0))
    ).toDF("ts", "value")
      .select(timestamp_micros($"ts").as("ts"), $"value")
    val aggs = Aggregators.parseAggs(
      """[{"type":"doubleFirst","name":"fv","fieldName":"value"},
        |{"type":"doubleLast","name":"lv","fieldName":"value"}]""".stripMargin)
      .map(a => Aggregators.compile(a, df.schema, "ts"))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    assert(row.getDouble(0) == 5.0, "null at the earliest tie must not win")
    assert(row.getDouble(1) == 2.0)
    // EVERY row at the global earliest ts is null → first is taken at
    // the earliest ts having a non-null value (Druid null skipping; the
    // SQL mirror computes its boundary ts per-column over non-null rows
    // for exactly this case)
    val nullBoundary = Seq(
      (1000L, Option.empty[Double]), (2000L, Some(7.0)), (3000L, Some(1.0))
    ).toDF("ts", "value")
      .select(timestamp_micros($"ts").as("ts"), $"value")
    val aggsNb = Aggregators.parseAggs(
      """[{"type":"doubleFirst","name":"fv","fieldName":"value"}]""")
      .map(a => Aggregators.compile(a, nullBoundary.schema, "ts"))
    assert(nullBoundary.agg(aggsNb.head).collect()(0).getDouble(0) == 7.0,
      "first must skip past an all-null boundary timestamp")
    // all-null group → null result (matches SQL min/max over no rows)
    val allNull = Seq((1000L, Option.empty[Double])).toDF("ts", "value")
      .select(timestamp_micros($"ts").as("ts"), $"value")
    val aggs2 = Aggregators.parseAggs(
      """[{"type":"doubleFirst","name":"fv","fieldName":"value"}]""")
      .map(a => Aggregators.compile(a, allNull.schema, "ts"))
    assert(allNull.agg(aggs2.head).collect()(0).isNullAt(0))
  }

  test("hyperUnique estimate tracks exact cardinality") {
    val row = runAggs("""{"type":"hyperUnique","name":"hu","fieldName":"user_id"}""")
    val exact = ev.select($"user_id").distinct().count().toDouble
    assert(math.abs(row.getDouble(0) - exact) / exact < 0.05,
      s"hll ${row.getDouble(0)} vs exact $exact")
  }

  test("hyperUnique estimate stays within 3σ at estimate-regime NDV") {
    // q_hll is rows-only at unbounded NDV (no honest SQL mirror); this
    // pins the estimator quantitatively in the regime the coupon-exact
    // oracle (q_hll_exact) can't reach: HLL with 2^lgK registers has
    // relative standard error ≈ 1.04/√(2^lgK) (Flajolet et al. 2007),
    // so a correct implementation at NDV ≫ 2^12 must land within 3σ
    val n = 200000L
    val df = spark.range(n).toDF("user_id")
    val spec = Aggregators.parseAggs(
      """[{"type":"hyperUnique","name":"hu","fieldName":"user_id"}]""").head
    val est = df.agg(Aggregators.compile(spec, df.schema)).collect()(0).getDouble(0)
    val sigma = 1.04 / math.sqrt((1 << 12).toDouble) // default lgK = 12
    val rel = math.abs(est - n) / n
    assert(rel <= 3 * sigma, s"estimate $est vs exact $n: rel err $rel > 3σ (${3 * sigma})")
  }

  test("thetaSketch estimate tracks exact cardinality") {
    val row = runAggs("""{"type":"thetaSketch","name":"th","fieldName":"event_id"}""")
    val exact = ev.select($"event_id").distinct().count().toDouble
    assert(math.abs(row.getDouble(0) - exact) / exact < 0.05)
  }

  test("filtered aggregator only counts matching rows") {
    val row = runAggs(
      """{"type":"filtered","name":"fc",
        |  "filter":{"type":"selector","dimension":"event_type","value":"purchase"},
        |  "aggregator":{"type":"count","name":"fc"}}""".stripMargin)
    val exact = ev.filter($"event_type" === "purchase").count()
    assert(row.getLong(0) == exact)
  }

  test("filtered works with ANY sub-aggregator: first/last, theta, quantiles") {
    // matches the reference's any-factory adapter
    // (druid-pig/udfs/AggregatorFactoryAdapter.java:43-119)
    val row = runAggs(
      """[
        |{"type":"filtered","name":"ff",
        |  "filter":{"type":"selector","dimension":"event_type","value":"purchase"},
        |  "aggregator":{"type":"doubleFirst","name":"ff","fieldName":"value"}},
        |{"type":"filtered","name":"fl",
        |  "filter":{"type":"selector","dimension":"event_type","value":"purchase"},
        |  "aggregator":{"type":"stringLast","name":"fl","fieldName":"event_type"}},
        |{"type":"filtered","name":"fth",
        |  "filter":{"type":"selector","dimension":"event_type","value":"purchase"},
        |  "aggregator":{"type":"thetaSketch","name":"fth","fieldName":"user_id"}},
        |{"type":"filtered","name":"fq",
        |  "filter":{"type":"selector","dimension":"event_type","value":"purchase"},
        |  "aggregator":{"type":"quantilesDoublesSketch","name":"fq","fieldName":"value"}},
        |{"type":"filtered","name":"fsum",
        |  "filter":{"type":"selector","dimension":"event_type","value":"purchase"},
        |  "aggregator":{"type":"doubleSum","name":"fsum","fieldName":"value"}}
        |]""".stripMargin)
    val purchases = ev.filter($"event_type" === "purchase")
    val byTime = purchases.orderBy($"ts").select($"value").collect()
    assert(row.getDouble(0) == byTime.head.getDouble(0), "filtered doubleFirst")
    assert(row.getString(1) == "purchase", "filtered stringLast")
    val exactCard = purchases.select($"user_id").distinct().count().toDouble
    assert(math.abs(row.getDouble(2) - exactCard) / exactCard < 0.05, "filtered theta")
    val (mn, mx) = {
      val r = purchases.agg(min($"value"), max($"value")).collect()(0)
      (r.getDouble(0), r.getDouble(1))
    }
    assert(row.getDouble(3) >= mn && row.getDouble(3) <= mx, "filtered KLL median in range")
    val exactSum = purchases.agg(sum($"value")).collect()(0).getDouble(0)
    assert(math.abs(row.getDouble(4) - exactSum) < 1e-6, "filtered doubleSum")
  }

  test("filtered first/last never picks a non-matching row's value") {
    // the globally-first row is (t=1, type=a); filtered on type=b the
    // first must be (t=2)'s value, not NULL and not t=1's
    val df = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "b", 30.0), (4L, "a", 40.0)
    ).toDF("t", "typ", "v").withColumn("t", timestamp_millis($"t"))
    val aggs = Aggregators.parseAggs(
      """[{"type":"filtered","name":"f",
        |   "filter":{"type":"selector","dimension":"typ","value":"b"},
        |   "aggregator":{"type":"doubleFirst","name":"f","fieldName":"v"}},
        |  {"type":"filtered","name":"l",
        |   "filter":{"type":"selector","dimension":"typ","value":"b"},
        |   "aggregator":{"type":"doubleLast","name":"l","fieldName":"v"}}]""".stripMargin)
      .map(a => Aggregators.compile(a, df.schema, timeCol = "t"))
    val r = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    assert(r.getDouble(0) == 20.0 && r.getDouble(1) == 30.0)
  }

  test("cardinality tuple encoding: (ab,c) != (a,bc), nulls positional") {
    // 4 distinct tuples that a naive concat would conflate into 2
    val df = Seq(
      ("ab", "c"), ("a", "bc"), ("abc", null), (null, "abc")
    ).toDF("d1", "d2")
    val spec = Aggregators.parseAggs(
      """{"type":"cardinality","name":"c","fields":["d1","d2"]}""").head
    val got = df.agg(Aggregators.compile(spec, df.schema)).collect()(0).getDouble(0)
    assert(math.round(got) == 4L, s"expected 4 distinct tuples, got $got")
  }

  test("cardinality byRow=false counts the value union across dims") {
    // values: d1 {ab, a, abc}, d2 {c, bc, abc} → union {ab, a, abc, c, bc} = 5
    val df = Seq(
      ("ab", "c"), ("a", "bc"), ("abc", null), (null, "abc")
    ).toDF("d1", "d2")
    val spec = Aggregators.parseAggs(
      """{"type":"cardinality","name":"c","fields":["d1","d2"],"byRow":false}""").head
    assert(!spec.byRow)
    val got = df.agg(Aggregators.compile(spec, df.schema)).collect()(0).getDouble(0)
    assert(math.round(got) == 5L, s"expected 5 distinct values in the union, got $got")
    // mergeable partials: group halves, union the sketch bytes, same answer
    import org.apache.spark.sql.functions._
    val halves = df.withColumn("g", monotonically_increasing_id() % 2)
      .groupBy("g").agg(Aggregators.compile(spec, df.schema, finalize = false).as("sk"))
    val merged = halves.agg(hll_sketch_estimate(hll_union_agg(col("sk"))).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.round(merged) == 5L, s"merged partials gave $merged")
  }

  test("doubleSum raises on overflow instead of silent 0.0") {
    val df = Seq(1.0, 1e33, 2.0).toDF("v")
    val spec = Aggregators.parseAggs(
      """{"type":"doubleSum","name":"s","fieldName":"v"}""").head
    val ex = intercept[Exception] {
      df.agg(Aggregators.compile(spec, df.schema)).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(ex).exists(_.contains("overflow")), s"got: ${messages(ex)}")
    // non-overflowing values still sum exactly
    val okDf = Seq(1.5, 2.25, -0.75).toDF("v")
    val ok = okDf.agg(Aggregators.compile(spec, okDf.schema)).collect()(0).getDouble(0)
    assert(ok == 3.0)
  }

  test("non-finalizing hyperUnique yields mergeable bytes (re-agg chain)") {
    val spec = Aggregators.parseAggs(
      """{"type":"hyperUnique","name":"sk","fieldName":"user_id"}""").head
    val perType = ev.groupBy($"event_type")
      .agg(Aggregators.compile(spec, ev.schema, "ts", finalize = false))
    assert(perType.schema("sk").dataType == org.apache.spark.sql.types.BinaryType)
    val merged = perType.agg(hll_sketch_estimate(hll_union_agg($"sk")).cast("double").as("e"))
      .collect()(0).getDouble(0)
    val exact = ev.select($"user_id").distinct().count().toDouble
    assert(math.abs(merged - exact) / exact < 0.05)
  }

  test("post-aggregator arithmetic over agg refs") {
    val aggs = Aggregators.parseAggs(
      """[{"type":"count","name":"cnt"},
        |{"type":"doubleSum","name":"sv","fieldName":"value"}]""".stripMargin)
      .map(a => Aggregators.compile(a, ev.schema, "ts"))
    val agged = ev.agg(aggs.head, aggs.tail: _*)
    val post = Aggregators.parsePostAggs(
      """{"type":"arithmetic","name":"mean","fn":"/",
        |  "fields":[{"type":"fieldAccess","fieldName":"sv"},
        |            {"type":"fieldAccess","fieldName":"cnt"}]}""".stripMargin)
    val got = agged.select((col("*") +: post.map(Aggregators.compilePostAgg)): _*)
      .collect()(0).getAs[Double]("mean")
    val direct = agged.collect()(0)
    assert(math.abs(got - direct.getAs[Double]("sv") / direct.getAs[Long]("cnt")) < 1e-9)
  }

  test("expression post-aggregator references agg outputs by name") {
    val aggs = Aggregators.parseAggs(
      """[{"type":"count","name":"cnt"},
        |{"type":"longSum","name":"su","fieldName":"user_id"}]""".stripMargin)
      .map(a => Aggregators.compile(a, ev.schema, "ts"))
    val agged = ev.agg(aggs.head, aggs.tail: _*)
    val post = Aggregators.parsePostAggs(
      """{"type":"expression","name":"mix","expression":"su * 2 + cnt"}""")
    val got = agged.select((col("*") +: post.map(Aggregators.compilePostAgg)): _*)
      .collect()(0)
    assert(got.getAs[Long]("mix") ==
      got.getAs[Long]("su") * 2 + got.getAs[Long]("cnt"))
  }
}
