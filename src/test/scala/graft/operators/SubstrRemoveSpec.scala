package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Removal step of substring dedup: cleaned text must equal the
  * original minus exactly the duplicatedSpans positions, and clean
  * documents must pass through byte-identical. */
class SubstrRemoveSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("shared 8-token run is cut from both docs; clean doc untouched") {
    val run = (1 to 8).map(i => s"dup$i").mkString(" ")
    val df = Seq(
      (1L, s"alpha beta $run gamma"),
      (2L, s"$run tail1 tail2 tail3 tail4 tail5 tail6 tail7"),
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10")
    ).toDF("doc_id", "text")
    val out = SubstringDedup.removeDuplicatedSpans(df, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("alpha beta gamma", 8L, 1L)))
    assert(out(2L) == (("tail1 tail2 tail3 tail4 tail5 tail6 tail7", 8L, 1L)))
    assert(out(3L) == (("u1 u2 u3 u4 u5 u6 u7 u8 u9 u10", 0L, 0L)))
  }

  test("doc that is one duplicated span end-to-end becomes empty") {
    val t = (1 to 9).map(i => s"w$i").mkString(" ")
    val df = Seq((1L, t), (2L, t)).toDF("doc_id", "text")
    val out = SubstringDedup.removeDuplicatedSpans(df, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out(1L) == "" && out(2L) == "")
  }

  test("excision: probe-matched run cut, probe-free doc byte-identical") {
    val run = (1 to 8).map(i => s"bench$i").mkString(" ")
    val probes = Seq((100L, s"intro $run outro")).toDF("doc_id", "text")
    val corpus = Seq(
      (1L, s"pre1 pre2 $run post1"),
      (2L, "c1 c2 c3 c4  c5 c6 c7 c8 c9") // double space preserved
    ).toDF("doc_id", "text")
    val out = SubstringDedup.exciseProbeSpans(
        corpus, "doc_id", "text", probes, "text", w = 8)
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out(1L) == (("pre1 pre2 post1", 8L, 1L)))
    assert(out(2L) == (("c1 c2 c3 c4  c5 c6 c7 c8 c9", 0L, 0L)))
  }

  test("excision spans == corpus windows whose hash is in the probe set (fixture)") {
    val all = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val probes = all.filter($"doc_id" < 5)
    val corpus = all.filter($"doc_id" >= 5)
    import graft.functions.TextFunctions
    val probeWh = probes
      .select(explode(TextFunctions.dupWindowHashes($"text", 8)).as("wh"))
      .collect().map(_.getLong(0)).toSet
    val expectedStarts = corpus
      .select($"doc_id", posexplode(TextFunctions.dupWindowHashes($"text", 8)))
      .collect().collect {
        case r if probeWh(r.getLong(2)) => (r.getLong(0), r.getInt(1) + 1L)
      }.toSet
    val spans = SubstringDedup.probeMatchedSpans(
      corpus, "doc_id", "text", probes, "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every expected start is covered by exactly one reported span,
    // and every span is wholly justified by expected starts
    val coveredStarts = spans.flatMap { case (id, s, e) =>
      (s to e - 7).map(id -> _) }.toSet
    assert(expectedStarts.subsetOf(coveredStarts))
    assert(spans.nonEmpty) // the check is live on the fixture
    for ((id, s, e) <- spans) {
      assert(expectedStarts((id, s)) && expectedStarts((id, e - 7)))
    }
  }

  test("cleaned text == tokens minus duplicatedSpans coverage, on the fixture") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val spans = SubstringDedup.duplicatedSpans(docs, "doc_id", "text", w = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1).view.mapValues(_.map(s => (s._2, s._3))).toMap
    val expected = docs.collect().map { r =>
      val id = r.getLong(0); val toks = r.getString(1).split(" ", -1)
      val cov = spans.getOrElse(id, Array.empty[(Long, Long)])
      val kept = toks.zipWithIndex.collect {
        case (t, i) if !cov.exists(s => i + 1 >= s._1 && i + 1 <= s._2) => t
      }
      id -> kept.mkString(" ")
    }.toMap
    val got = SubstringDedup.removeDuplicatedSpans(docs, "doc_id", "text", w = 8)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == expected)
    // some docs on the fixture actually have spans (the test is live)
    assert(spans.nonEmpty)
  }
}
