package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Self-repetition removal: per-doc window repeats cut, zero-shuffle
  * plan, and span semantics equal to an independent string-window
  * replay on the fixture. */
class SelfRepeatSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("hand case: repeated 3-window island merges and is cut") {
    // "a b c a b c d": window "a b c" repeats at starts 1 and 4;
    // islands merge (4 <= 1+3) -> one span [1, 6], keeping only "d"
    val df = Seq(
      (1L, "a b c a b c d"),
      (2L, "p q r s t u v"), // no repeats
      (3L, "x y")            // shorter than w
    ).toDF("doc_id", "text")
    val out = SubstringDedup.removeSelfRepeatedSpans(df, "doc_id", "text", w = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("d", 6L, 1L)))
    assert(out(2L) == (("p q r s t u v", 0L, 0L)))
    assert(out(3L) == (("x y", 0L, 0L)))
  }

  test("zero shuffles: the operator plan has no Exchange") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val plan = SubstringDedup.removeSelfRepeatedSpans(docs, "doc_id", "text", w = 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }

  test("fixture: cleaned text equals the string-window replay") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val w = 3
    val expected = docs.collect().map { r =>
      val id = r.getLong(0); val toks = r.getString(1).split(" ", -1)
      val wins = toks.sliding(w).map(_.mkString(" ")).toArray
      val counts = wins.groupBy(identity).view.mapValues(_.length).toMap
      val starts = wins.zipWithIndex.collect {
        case (win, i) if toks.length >= w && counts(win) >= 2 => i + 1
      }
      val covered = starts.flatMap(s0 => s0 until s0 + w).toSet
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !covered(i + 1) => t
      }
      id -> kept.mkString(" ")
    }.toMap
    val got = SubstringDedup.removeSelfRepeatedSpans(docs, "doc_id", "text", w = w)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
    // live: at least one fixture doc actually changed
    assert(docs.collect().exists(r => expected(r.getLong(0)) != r.getString(1)))
  }
}
