package graft.operators

import graft.SparkSpec
import graft.functions.TextFunctions
import org.apache.spark.sql.functions._

/** DSIR importance scoring: the learned weight table must describe
  * exactly the feature stream inference reads, the smoothed-ratio
  * arithmetic must be the documented floor division, and target-heavy
  * documents must outscore off-target ones. */
class ImportanceSelectionSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (0L, "the quick brown fox", true),
    (1L, "the quick brown dog", true),
    (2L, "lorem ipsum dolor sit", false),
    (3L, "the quick brown fox", false), // raw copy of a target doc
    (4L, "zzz yyy xxx www", false)
  ).toDF("id", "text", "tgt")

  test("scores equal a hand-computed fold over FeatureBuckets") {
    val B = 64
    val fp = 1000000L
    // bucket stats straight from the shared feature definition
    val stats = corpus
      .select(col("tgt"),
        explode(TextFunctions.featureBuckets(lower(col("text")), B)).as("b"))
      .groupBy("b")
      .agg(sum(when(col("tgt"), 1L).otherwise(0L)).as("t"),
        count(lit(1)).as("r"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val expected = corpus.select(col("id"),
        TextFunctions.featureBuckets(lower(col("text")), B).as("fb"))
      .collect().map { r =>
        val score = r.getSeq[Long](1).map { b =>
          val (t, cnt) = stats(b)
          fp * (t + 1) / (cnt + 1)
        }.sum
        r.getLong(0) -> score
      }.toMap

    val got = ImportanceSelection.dsirScores(
        corpus, "id", "text", isTarget = col("tgt"),
        buckets = B, fixedPoint = fp)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == expected)
  }

  test("target-like documents outscore off-target ones; dup of a target doc scores like it") {
    val out = ImportanceSelection.dsirScores(
        corpus, "id", "text", isTarget = col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // doc 3 shares every feature with target doc 0 — identical avg
    assert(out(3) == out(0))
    // the alien docs 2 and 4 score strictly below every target-like doc
    assert(out(2) < out(0) && out(4) < out(0))
    assert(out(2) < out(1) && out(4) < out(1))
  }

  test("n_features matches the scorer's 2n-1 feature count") {
    val out = ImportanceSelection.dsirScores(
        corpus, "id", "text", isTarget = col("tgt"), buckets = 64)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(0) == 7) // 4 tokens -> 4 unigrams + 3 bigrams
    assert(out(2) == 7)
  }

  test("FeatureBuckets stream matches LinearTextScore's supplied-table read") {
    // score with a recognizable table: weight(b) = b. Then
    // LinearTextScore == sum of FeatureBuckets values.
    val B = 128
    val w = Array.tabulate(B)(_.toLong)
    val viaScore = corpus.select(col("id"),
        TextFunctions.linearTextScore(lower(col("text")), B, 1, Some(w)).as("s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaBuckets = corpus.select(col("id"),
        TextFunctions.featureBuckets(lower(col("text")), B).as("fb"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).sum).toMap
    assert(viaScore == viaBuckets)
  }
}
