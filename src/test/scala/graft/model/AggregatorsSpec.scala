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

  test("hyperUnique estimate tracks exact cardinality") {
    val row = runAggs("""{"type":"hyperUnique","name":"hu","fieldName":"user_id"}""")
    val exact = ev.select($"user_id").distinct().count().toDouble
    assert(math.abs(row.getDouble(0) - exact) / exact < 0.05,
      s"hll ${row.getDouble(0)} vs exact $exact")
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
}
