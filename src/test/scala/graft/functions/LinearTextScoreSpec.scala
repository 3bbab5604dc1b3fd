package graft.functions

import graft.SparkSpec
import org.apache.spark.unsafe.types.UTF8String

class LinearTextScoreSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  /** Independent recomputation: unigram + adjacent-bigram features,
    * fnv64 → unsigned mod buckets → mod span − span/2, summed. */
  private def expected(text: String, buckets: Int = 1 << 16, span: Int = 61): Long = {
    val toks = text.split(" ", -1)
    def w(f: String): Long =
      java.lang.Long.remainderUnsigned(
        TextFunctions.fnv64(UTF8String.fromString(f)), buckets) % span - span / 2
    toks.map(w).sum + toks.sliding(2).filter(_.length == 2)
      .map(p => w(p(0) + " " + p(1))).sum
  }

  test("score matches the independent feature-by-feature recomputation") {
    val texts = Seq("the quick brown fox", "a", "", "x  y", "café déjà vu")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id", TextFunctions.linearTextScore($"text").as("s"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(got.toSeq == texts.map(expected(_)))
  }

  test("bigram features matter: reordering tokens changes the score") {
    val a = expected("alpha beta gamma")
    val b = expected("gamma beta alpha")
    assert(a != b, "unigram-only scoring would be order-invariant")
  }

  test("caller-supplied weight table is read bucket-for-bucket") {
    val buckets = 1 << 16
    // a non-trivial table: every bucket gets a distinct-ish weight
    val tab = Array.tabulate(buckets)(b => (b * 7L) % 1013L - 506L)
    def wSup(f: String): Long =
      tab(java.lang.Long.remainderUnsigned(
        TextFunctions.fnv64(UTF8String.fromString(f)), buckets).toInt)
    def expSup(text: String): Long = {
      val toks = text.split(" ", -1)
      toks.map(wSup).sum + toks.sliding(2).filter(_.length == 2)
        .map(p => wSup(p(0) + " " + p(1))).sum
    }
    val texts = Seq("the quick brown fox", "a", "", "café déjà vu")
    val got = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "text")
      .select($"id",
        TextFunctions.linearTextScore($"text", weights = Some(tab)).as("s"))
      .orderBy("id").collect().map(_.getLong(1))
    assert(got.toSeq == texts.map(expSup))
    // and it genuinely diverges from the stub table
    assert(got.toSeq != texts.map(expected(_)))
    // table size must match the bucket count
    intercept[IllegalArgumentException] {
      TextFunctions.linearTextScore($"text", weights = Some(Array(1L, 2L)))
    }
  }

  test("expression compiles under whole-stage codegen, no fallback") {
    val df = spark.range(1)
      .select(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit("some text here"),
        $"id".cast("string").substr(0, 0)).as("text"))
      .select(TextFunctions.linearTextScore($"text").as("s"))
    val plan = df.queryExecution.executedPlan.toString
    // "*(1)" marks the whole-stage-codegen span in the plan string
    assert(plan.contains("*(1) Project [lineartextscore"), plan)
    assert(df.collect()(0).getLong(0) == expected("some text here"))
  }
}
