package graft.tools

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the two properties the scale-ladder data generator rests on:
  * the two-level embedding shift keeps every copy pairwise DISTINCT
  * (≥0.8 L∞ apart — no planted cross-copy near-dups, so pair-emitting
  * operators measure data scaling, not O(copies²) pair growth), and
  * copies < 64 reproduce the original single-level arithmetic exactly
  * (previously built ≤64× dirs stay byte-identical).
  */
class ScaleDataSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 64

  private def copiesOf(base: Seq[Float], copies: Int) =
    Seq(Tuple1(base)).toDF("embedding")
      .crossJoin(broadcast(spark.range(copies).select(col("id").as("__copy"))))
      .withColumn("embedding", ScaleData.embedShift(col("embedding")))

  test("embedShift: 130 copies of one vector are pairwise distinct, L-inf >= 0.8") {
    val base = (0 until dim).map(d => 0.01f * d)
    val vecs = copiesOf(base, 130)
      .select(col("__copy"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    assert(vecs.size == 130)
    assert(vecs.values.map(_.toVector).toSet.size == 130, "copies collided")
    for (Seq(a, b) <- vecs.keys.toSeq.sorted.combinations(2)) {
      val linf = vecs(a).zip(vecs(b)).map { case (x, y) => math.abs(x - y) }.max
      assert(linf >= 0.8f - 1e-4f, s"copies $a,$b only $linf apart")
    }
  }

  test("embedShift: copies < 64 match the legacy single-level shift bit-for-bit") {
    val base = (0 until dim).map(d => -1.5f + 0.07f * d)
    val got = copiesOf(base, 64)
      .select(col("__copy"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    for (c <- 0L until 64L; d <- 0 until dim) {
      val legacy = if (c > 0 && d == (c % 64)) base(d) + 0.8f else base(d)
      assert(java.lang.Float.floatToRawIntBits(got(c)(d)) ==
        java.lang.Float.floatToRawIntBits(legacy), s"copy $c dim $d")
    }
  }

  test("embedShift: second level lands on dim (c div 64), 2.4 when dims coincide") {
    val base = Vector.fill(dim)(0f)
    val got = copiesOf(base, 200)
      .select(col("__copy"), col("embedding")).as[(Long, Seq[Float])]
      .collect().toMap
    // c = 100: dims 36 (+0.8) and 1 (+1.6)
    assert(got(100L)(36) == 0.8f && got(100L)(1) == 1.6f)
    assert(got(100L).count(_ != 0f) == 2)
    // c = 65: both levels hit dim 1 -> +2.4
    assert(got(65L)(1) == 2.4f && got(65L).count(_ != 0f) == 1)
    // c = 128: lvl1 dim 0, lvl2 dim 2
    assert(got(128L)(0) == 0.8f && got(128L)(2) == 1.6f)
  }
}
