package graft.model

import graft.SparkSpec
import org.apache.spark.sql.functions._

class FixedHistogramSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  // values: 2 below 10, buckets of width 10 on [10, 50), 3 above, one
  // exactly at the upper limit
  private lazy val df = Seq(3.0, 7.0, 10.0, 15.0, 22.5, 30.0, 39.99, 41.0,
      50.0, 55.0, 60.0, 77.0).toDF("v").repartition(5)

  private def hist(mode: String) = {
    val spec = Aggregators.parseAggs(
      s"""{"type":"fixedBucketsHistogram","name":"h","fieldName":"v",
         |"lowerLimit":10.0,"upperLimit":50.0,"numBuckets":4,
         |"outlierHandlingMode":"$mode"}""".stripMargin).head
    val r = df.agg(Aggregators.compile(spec, df.schema, "v")).head()
    val s = r.getStruct(0)
    (s.getSeq[Long](0), s.getLong(1), s.getLong(2))
  }

  test("overflow mode: in-range buckets + separate outlier counts") {
    // [10,20): 10,15 → 2; [20,30): 22.5 → 1; [30,40): 30,39.99 → 2;
    // [40,50): 41 and v==50 (upper edge → last bucket) → 2
    assert(hist("overflow") == (Seq(2L, 1L, 2L, 2L), 2L, 3L))
  }

  test("clip mode pushes outliers into the edge buckets") {
    assert(hist("clip") == (Seq(4L, 1L, 2L, 5L), 0L, 0L))
  }

  test("ignore mode drops outliers entirely") {
    assert(hist("ignore") == (Seq(2L, 1L, 2L, 2L), 0L, 0L))
  }

  test("empty groups produce zero-filled buckets, and nulls are skipped") {
    val withNulls = Seq(Some(15.0), None, None).toDF("v")
    val spec = Aggregators.parseAggs(
      """{"type":"fixedBucketsHistogram","name":"h","fieldName":"v",
        |"lowerLimit":10.0,"upperLimit":50.0,"numBuckets":4}""".stripMargin).head
    val r = withNulls.agg(Aggregators.compile(spec, withNulls.schema, "v")).head()
    assert(r.getStruct(0).getSeq[Long](0) == Seq(1L, 0L, 0L, 0L))
  }

  test("filtered wrapper guards the histogram input") {
    val rows = Seq(("a", 15.0), ("b", 15.0), ("a", 25.0)).toDF("t", "v")
    val spec = Aggregators.parseAggs(
      """{"type":"filtered",
        |"filter":{"type":"selector","dimension":"t","value":"a"},
        |"aggregator":{"type":"fixedBucketsHistogram","name":"h","fieldName":"v",
        |  "lowerLimit":10.0,"upperLimit":50.0,"numBuckets":4}}""".stripMargin).head
    val r = rows.agg(Aggregators.compile(spec, rows.schema, "v")).head()
    assert(r.getStruct(0).getSeq[Long](0) == Seq(1L, 1L, 0L, 0L))
  }
}
