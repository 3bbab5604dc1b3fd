package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KllSketchSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("exact quantiles while n <= k") {
    val df = (1 to 100).map(_.toDouble).toDF("v")
    val row = df.agg(KllSketch.kll_sketch_agg($"v", 200).as("sk"))
      .select(
        KllSketch.kll_quantile($"sk", lit(0.5)).as("p50"),
        KllSketch.kll_quantile($"sk", lit(0.99)).as("p99"),
        KllSketch.kll_quantile($"sk", lit(1.0)).as("max"))
      .collect()(0)
    assert(row.getDouble(0) == 50.0)
    assert(row.getDouble(1) == 99.0)
    assert(row.getDouble(2) == 100.0)
  }

  test("approximate quantiles within rank error at n >> k") {
    val n = 100000
    val df = (1 to n).map(_.toDouble).toDF("v")
    val p50 = df.agg(KllSketch.kll_sketch_agg($"v", 200).as("sk"))
      .select(KllSketch.kll_quantile($"sk", lit(0.5)).as("p50"))
      .collect()(0).getDouble(0)
    assert(math.abs(p50 - n / 2.0) / n < 0.02, s"p50=$p50")
  }

  test("sketch bytes re-aggregate: per-group merge equals one global sketch") {
    val df = (1 to 10000).map(i => (i % 7, i.toDouble)).toDF("g", "v")
    val perGroup = df.groupBy($"g").agg(KllSketch.kll_sketch_agg($"v").as("sk"))
    val merged = perGroup.agg(KllSketch.kll_sketch_agg($"sk").as("sk"))
      .select(KllSketch.kll_quantile($"sk", lit(0.5)).as("p50"))
      .collect()(0).getDouble(0)
    assert(math.abs(merged - 5000.0) / 10000 < 0.02, s"merged p50=$merged")
  }

  test("quantilesDoublesSketch aggregator + ToQuantile post-agg via JSON") {
    val ev = graft.Tables.events(spark, sf())
    val spec = graft.model.Aggregators.parseAggs(
      """{"type":"quantilesDoublesSketch","name":"vq","fieldName":"value"}""").head
    val agged = ev.groupBy($"event_type")
      .agg(graft.model.Aggregators.compile(spec, ev.schema, "ts", finalize = false))
    val post = graft.model.Aggregators.compilePostAgg(
      org.json4s.jackson.JsonMethods.parse(
        """{"type":"quantilesDoublesSketchToQuantile","name":"p90",
          |  "fraction":0.9,
          |  "field":{"type":"fieldAccess","fieldName":"vq"}}""".stripMargin))
    val rows = agged.select($"event_type", post).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(r.getDouble(1) > 0))
  }
}
