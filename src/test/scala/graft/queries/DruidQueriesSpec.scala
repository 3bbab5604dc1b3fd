package graft.queries

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class DruidQueriesSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private lazy val ev = Tables.events(spark, sf())

  test("timeseries descending reverses bucket order") {
    val out = DruidQueries.run(ev, "ts",
      """{"queryType":"timeseries","granularity":"day","descending":true,
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .select("__time").collect().map(_.getTimestamp(0).getTime)
    assert(out.sameElements(out.sorted(Ordering[Long].reverse)))
  }

  test("topN inverted metric returns the bottom-k") {
    val normal = DruidQueries.run(ev, "ts",
      """{"queryType":"topN","dimension":"event_type","metric":"cnt","threshold":99,
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect().map(_.getAs[Long]("cnt"))
    val inverted = DruidQueries.run(ev, "ts",
      """{"queryType":"topN","dimension":"event_type",
        |"metric":{"type":"inverted","metric":"cnt"},"threshold":99,
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect().map(_.getAs[Long]("cnt"))
    assert(normal.sameElements(inverted.reverse))
  }

  test("topN dimension metric orders lexicographically") {
    val out = DruidQueries.run(ev, "ts",
      """{"queryType":"topN","dimension":"event_type",
        |"metric":{"type":"dimension"},"threshold":3,
        |"aggregations":[{"type":"count","name":"cnt"}]}""".stripMargin)
      .collect().map(_.getString(0))
    assert(out.sameElements(out.sorted))
    assert(out.length == 3)
  }

  test("search strlen sort orders by value length") {
    val out = DruidQueries.run(ev, "ts",
      """{"queryType":"search","searchDimensions":["event_type"],
        |"query":{"type":"insensitive_contains","value":"e"},
        |"sort":{"type":"strlen"}}""".stripMargin)
      .collect().map(_.getAs[String]("value"))
    val lens = out.map(_.length)
    assert(lens.sameElements(lens.sorted))
  }

  test("unknown queryType fails with a clear message") {
    val e = intercept[IllegalArgumentException](
      DruidQueries.run(ev, "ts", """{"queryType":"mystery"}"""))
    assert(e.getMessage.contains("mystery"))
  }

  test("unknown aggregator type fails with a clear message") {
    val e = intercept[IllegalArgumentException](
      DruidQueries.run(ev, "ts",
        """{"queryType":"timeseries","granularity":"day",
          |"aggregations":[{"type":"wat","name":"x"}]}""".stripMargin))
    assert(e.getMessage.contains("wat"))
  }

  test("dedupByMinhash keeps one representative per near-dup cluster") {
    val df = Seq(
      (5L, "a b c d e f g h i j"), (9L, "a b c d e f g h i j"),
      (7L, "entirely different content with no overlap at all here"))
      .toDF("doc_id", "text")
    val kept = graft.operators.Dedup.dedupByMinhash(df, "doc_id", "text", 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(5L, 7L))
  }
}
