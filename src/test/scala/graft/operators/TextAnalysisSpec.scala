package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("redact replaces emails, phones, and URLs with typed placeholders") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1-555-123-4567 now"),
      (2L, "see https://example.com/path?q=1 for details"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "contact <EMAIL> or call <PHONE> now")
    assert(out(1) == "see <URL> for details")
    assert(out(2) == "nothing sensitive here")
  }

  test("contamination flags corpus docs sharing fingerprints with probes") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "an entirely different document about distributed query engines"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow")
    ).toDF("doc_id", "text")
    // probe = a benchmark item overlapping docs 1 and 3, not 2
    val probes = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("probe_id", "text")
    val hits = TextAnalysis.contamination(
      corpus, "doc_id", "text", probes, "probe_id", "text", minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((1L, 100L)) && hits.contains((3L, 100L)))
    assert(!hits.exists(_._1 == 2L), "unrelated doc must not be flagged")
  }
}
