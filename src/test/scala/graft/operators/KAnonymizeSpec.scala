package graft.operators

import graft.SparkSpec

class KAnonymizeSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("rows in combos under k are suppressed; combos at k survive whole") {
    val df = Seq(
      ("a", 1, 10L), ("a", 1, 11L), ("a", 1, 12L), // combo (a,1): 3 rows
      ("a", 2, 20L), ("a", 2, 21L),                // (a,2): 2 rows
      ("b", 1, 30L)                                // (b,1): 1 row
    ).toDF("g", "h", "id")
    val kept = Sampling.kAnonymize(df, Seq("g", "h"), k = 3L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(10L, 11L, 12L))
    // k=2 keeps (a,1) and (a,2)
    val kept2 = Sampling.kAnonymize(df, Seq("g", "h"), k = 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept2 == Set(10L, 11L, 12L, 20L, 21L))
  }

  test("NULL quasi values form a combo of their own and can survive") {
    val df = Seq(
      (Some("a"), 1L), (None, 2L), (None, 3L)
    ).toDF("g", "id")
    val kept = Sampling.kAnonymize(df, Seq("g"), k = 2L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(kept == Set(2L, 3L), "null combo with >= k rows must be kept")
  }

  test("k=1 keeps everything") {
    val df = Seq(("a", 1L), ("b", 2L)).toDF("g", "id")
    assert(Sampling.kAnonymize(df, Seq("g"), k = 1L).count() == 2L)
  }
}
