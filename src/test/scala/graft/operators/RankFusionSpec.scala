package graft.operators

import graft.SparkSpec

class RankFusionSpec extends SparkSpec {
  import spark.implicits._

  private def ranking(pairs: (Long, Int)*) =
    pairs.toDF("doc_id", "rank")

  test("rrf: fixed-point sum over lists, docs in both lists win") {
    val a = ranking(1L -> 1, 2L -> 2, 3L -> 3)
    val b = ranking(2L -> 1, 4L -> 2)
    val out = RankFusion.rrf(Seq(a, b), "doc_id", "rank", kConst = 60, topK = 10)
      .orderBy("fused_rank").collect()
    def c(r: Int): Long = 1000000000000L / (60 + r)
    val expect = Seq(
      2L -> (c(2) + c(1)), // in both lists
      1L -> c(1), 4L -> c(2), 3L -> c(3))
    assert(out.map(r => (r.getLong(1), r.getLong(3))).toSeq == expect)
    assert(out.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    assert(out.find(_.getLong(1) == 2L).get.getLong(2) == 2L) // n_lists
  }

  test("rrf: deterministic tie-break on id; topK bounds output") {
    val a = ranking(10L -> 1, 5L -> 2)
    val b = ranking(5L -> 1, 10L -> 2) // symmetric: scores tie
    val out = RankFusion.rrf(Seq(a, b), "doc_id", "rank", topK = 1).collect()
    assert(out.length == 1 && out.head.getLong(1) == 5L) // lower id wins tie
  }

  test("rrf: rejects empty input") {
    intercept[IllegalArgumentException] {
      RankFusion.rrf(Seq.empty, "doc_id", "rank")
    }
  }
}
