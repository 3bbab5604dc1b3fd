package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ChunkVocabSpec extends SparkSpec {
  import spark.implicits._

  test("chunkTokens: overlapping windows cover every token; short docs = one chunk") {
    // 10 tokens, window 4, stride 3 → chunks at 0,3,6 … ceil((10-4)/3)+1 = 3
    val docs = Seq(
      (1L, (1 to 10).map(i => s"w$i").mkString(" ")),
      (2L, "a b"), // shorter than the window → one chunk
      (3L, "")).toDF("id", "text")
    val out = TextAnalysis.chunkTokens(docs, "id", "text", window = 4, stride = 3)
      .orderBy("id", "chunk_id")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getInt(3)))

    assert(out.filter(_._1 == 1L).map(_._3).toSeq == Seq(
      "w1 w2 w3 w4", "w4 w5 w6 w7", "w7 w8 w9 w10"))
    assert(out.filter(_._1 == 1L).map(_._4).toSeq == Seq(4, 4, 4))
    assert(out.filter(_._1 == 2L).toSeq == Seq((2L, 0, "a b", 2)))
    assert(out.count(_._1 == 3L) == 1, "empty text still yields one (empty) chunk")
  }

  test("chunkTokens: last partial window is shorter, every token covered") {
    // 9 tokens, window 4, stride 4 (no overlap) → 3 chunks, last has 1 token
    val docs = Seq((1L, (1 to 9).map(i => s"t$i").mkString(" "))).toDF("id", "text")
    val out = TextAnalysis.chunkTokens(docs, "id", "text", window = 4, stride = 4)
      .orderBy("chunk_id").collect().map(r => (r.getString(2), r.getInt(3)))
    assert(out.toSeq == Seq(("t1 t2 t3 t4", 4), ("t5 t6 t7 t8", 4), ("t9", 1)))
  }

  test("vocabulary: counts, doc frequency, min-count filter, deterministic top-k") {
    val docs = Seq(
      (1L, "a a b c"), (2L, "a b"), (3L, " b")).toDF("id", "text")
    val out = TextAnalysis.vocabulary(docs, "id", "text", minCount = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    // a: 3 occurrences in 2 docs; b: 3 in 3 docs; c dropped (1 < 2);
    // '' dropped. Tie on n=3 breaks alphabetically: a before b.
    assert(out.toSeq == Seq(("a", 3L, 2L), ("b", 3L, 3L)))
  }

  test("vocabulary plans top-k as TakeOrderedAndProject, not a global sort") {
    val docs = Seq((1L, "x y z")).toDF("id", "text")
    val plan = TextAnalysis.vocabulary(docs, "id", "text", 1, 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }
}
