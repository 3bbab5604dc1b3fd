package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class FreqSketchSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def items(df: org.apache.spark.sql.DataFrame): Seq[(String, Long, Long, Long)] =
    df.select(explode(FreqSketch.freq_items(col("sk"))).as("r"))
      .select("r.item", "r.est", "r.lb", "r.ub")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq

  test("exact regime: every item reported with its exact count, ordered") {
    val rows = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ Seq.fill(20)("c")
    val df = rows.toDF("x").repartition(7)
      .agg(FreqSketch.freq_sketch_agg(col("x"), 64).as("sk"))
    assert(items(df) == Seq(("a", 50L, 50L, 50L), ("b", 30L, 30L, 30L),
      ("c", 20L, 20L, 20L)))
  }

  test("estimate regime: heavy hitters survive with bracketing bounds") {
    // 3 heavy keys over a long tail that overflows a 64-slot map
    val heavy = Seq("h1" -> 5000, "h2" -> 3000, "h3" -> 2000)
    val rows = heavy.flatMap { case (k, n) => Seq.fill(n)(k) } ++
      (1 to 4000).map(i => s"tail$i")
    val n = rows.size.toLong
    val df = rows.toDF("x").repartition(16)
      .agg(FreqSketch.freq_sketch_agg(col("x"), 64).as("sk"))
    val got = items(df).map(t => t._1 -> t).toMap
    heavy.foreach { case (k, trueN) =>
      val t = got.getOrElse(k, fail(s"heavy hitter $k missing (no-false-negatives violated)"))
      assert(t._3 <= trueN && trueN <= t._4, s"$k bounds ${t._3}..${t._4} miss $trueN")
      // library max-error guarantee: ~3.5 n / maxMapSize
      assert(t._4 - t._3 <= (3.5 * n / 64).toLong + 1)
    }
  }

  test("merging sketch bytes reaggregates counts (exact regime)") {
    val a = Seq.fill(10)("x") ++ Seq.fill(5)("y")
    val b = Seq.fill(7)("x") ++ Seq.fill(9)("z")
    val parts = a.map(("g1", _)) ++ b.map(("g2", _))
    val perGroup = parts.toDF("g", "v").groupBy("g")
      .agg(FreqSketch.freq_sketch_agg(col("v"), 64).as("sk"))
    val merged = perGroup.agg(FreqSketch.freq_sketch_agg(col("sk"), 64).as("sk"))
    assert(items(merged) == Seq(("x", 17L, 17L, 17L), ("z", 9L, 9L, 9L),
      ("y", 5L, 5L, 5L)))
  }

  test("nulls are skipped; empty input yields an empty item list") {
    val df = Seq[(String, Option[String])](("g", None), ("g", None))
      .toDF("g", "v")
      .agg(FreqSketch.freq_sketch_agg(col("v"), 64).as("sk"))
    assert(items(df).isEmpty)
  }
}
