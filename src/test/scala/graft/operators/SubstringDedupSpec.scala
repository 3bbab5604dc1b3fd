package graft.operators

import graft.SparkSpec

class SubstringDedupSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private val shared =
    "one two three four five six seven eight nine ten" // 10 tokens

  private def spans(df: org.apache.spark.sql.DataFrame, w: Int = 8) =
    SubstringDedup.duplicatedSpans(df, "id", "text", w)
      .orderBy("id", "span_start")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
      .toSeq

  test("cross-document shared phrase yields exactly the shared span") {
    val df = Seq(
      (1L, s"alpha $shared beta"),   // shared at tokens 2..11 of 12
      (2L, s"gamma delta $shared"),  // shared at tokens 3..12 of 12
      (3L, "nothing in common with anyone else here at all today ok")
    ).toDF("id", "text")
    // windows fully inside the shared region are the duplicated ones:
    // doc1 starts 2..4, doc2 starts 3..5 → spans covering the 10 shared
    // tokens exactly, 3 duplicated windows each
    assert(spans(df) == Seq(
      (1L, 2L, 11L, 10L, 3L),
      (2L, 3L, 12L, 10L, 3L)))
  }

  test("within-document repetition counts as duplication") {
    val df = Seq((7L, s"$shared filler $shared")).toDF("id", "text")
    // copies at tokens 1..10 and 12..21; starts {1,2,3} and {12,13,14};
    // gap 12 > 3 + 8 keeps the islands separate
    assert(spans(df) == Seq(
      (7L, 1L, 10L, 10L, 3L),
      (7L, 12L, 21L, 10L, 3L)))
  }

  test("identical documents merge into one whole-document span") {
    val text = s"$shared eleven twelve thirteen fourteen fifteen sixteen"
    val df = Seq((1L, text), (2L, text)).toDF("id", "text")
    // 16 tokens, every window duplicated → starts 1..9 merge to [1,16]
    assert(spans(df) == Seq(
      (1L, 1L, 16L, 16L, 9L),
      (2L, 1L, 16L, 16L, 9L)))
  }

  test("documents shorter than the window and unique documents are absent") {
    val df = Seq(
      (1L, "short doc"),
      (2L, "short doc"), // 2 tokens < w: no windows even though equal
      (3L, "a unique sentence with eight tokens in it yes")
    ).toDF("id", "text")
    assert(spans(df).isEmpty)
  }

  test("result is partitioning-invariant") {
    val docs = (1L to 40L).map { i =>
      if (i % 4 == 0) (i, s"prefix$i $shared suffix$i")
      else (i, s"unique text number $i with no duplication beyond itself ${i * 7} ${i * 13} ${i * 29}")
    }
    val a = spans(docs.toDF("id", "text"))
    val b = spans(docs.toDF("id", "text").repartition(13))
    assert(a == b)
    assert(a.nonEmpty && a.forall { case (id, s, e, n, _) =>
      id % 4 == 0 && s == 2 && e == 11 && n == 10
    })
  }
}
