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

  private def grouped(rows: (Long, Long, Int)*) =
    rows.toDF("query_id", "doc_id", "rank")

  test("rrfGrouped: per-group fusion equals per-group rrf; WindowGroupLimit plan") {
    val a = grouped((0L, 1L, 1), (0L, 2L, 2), (1L, 7L, 1), (1L, 8L, 2))
    val b = grouped((0L, 2L, 1), (0L, 3L, 2), (1L, 8L, 1))
    val out = RankFusion.rrfGrouped(Seq(a, b), "query_id", "doc_id", "rank",
      kConst = 60, topK = 10)
    val got = out.collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .groupBy(_._1).view
      .mapValues(_.sortBy(_._2).map(t => (t._3, t._4, t._5)).toSeq).toMap
    // truth: per-group, run the single-list rrf on that group's slices
    for (g <- Seq(0L, 1L)) {
      val want = RankFusion.rrf(
          Seq(a.filter($"query_id" === g).drop("query_id"),
            b.filter($"query_id" === g).drop("query_id")),
          "doc_id", "rank", kConst = 60, topK = 10)
        .orderBy("fused_rank").collect()
        .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
      assert(got(g) == want, s"group $g")
    }
    // plan shape on a parquet-backed input (a LocalRelation with a
    // known tiny row count doesn't trigger the rewrite): the per-group
    // rank <= topK must plan as WindowGroupLimit bounded heaps
    val dir = java.nio.file.Files.createTempDirectory("rrfg").toString
    try {
      a.unionByName(b).write.mode("overwrite").parquet(dir)
      val fromDisk = spark.read.parquet(dir)
      val plan = RankFusion.rrfGrouped(Seq(fromDisk, fromDisk),
          "query_id", "doc_id", "rank", topK = 5)
        .queryExecution.executedPlan.toString
      assert(plan.contains("WindowGroupLimit"),
        s"plan lacks WindowGroupLimit:\n$plan")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("rrfGrouped: per-group tie-break and topK bound") {
    val a = grouped((0L, 10L, 1), (0L, 5L, 2))
    val b = grouped((0L, 5L, 1), (0L, 10L, 2))
    val out = RankFusion.rrfGrouped(Seq(a, b), "query_id", "doc_id", "rank",
      topK = 1).collect()
    assert(out.length == 1 && out.head.getLong(2) == 5L)
  }

  test("a rank < 1 fails loudly instead of silently dropping its contribution") {
    // with kConst=0 and rank=0 the integer div would emit NULL and the
    // list's contribution would vanish from rrf_score while n_lists
    // still counted it — must raise, in both forms
    val bad = ranking((10L, 1), (5L, 0))
    val e = intercept[Exception] {
      RankFusion.rrf(Seq(bad), "doc_id", "rank", kConst = 0).collect()
    }
    assert(e.getMessage.contains("rank must be >= 1"), e.getMessage)
    val badG = grouped((0L, 10L, 1), (0L, 5L, -60))
    val eg = intercept[Exception] {
      RankFusion.rrfGrouped(Seq(badG), "query_id", "doc_id", "rank").collect()
    }
    assert(eg.getMessage.contains("rank must be >= 1"), eg.getMessage)
  }

  test("a NULL rank fails loudly too (null value or failed cast)") {
    import spark.implicits._
    // `__r < 1` alone is NULL on a NULL rank — the contribution would
    // silently vanish from rrf_score while n_lists still counted the
    // row, the exact skew the guard closes
    val nullRank = Seq((10L, Some(1L)), (5L, Option.empty[Long]))
      .toDF("doc_id", "rank")
    val e = intercept[Exception] {
      RankFusion.rrf(Seq(nullRank), "doc_id", "rank").collect()
    }
    assert(e.getMessage.contains("rank must be >= 1"), e.getMessage)
    // a non-numeric string rank is loud too: under ANSI the cast
    // itself throws; with ANSI off it casts to NULL and hits the guard
    val uncastable = Seq((10L, "1"), (5L, "not-a-rank")).toDF("doc_id", "rank")
    val e2 = intercept[Exception] {
      RankFusion.rrf(Seq(uncastable), "doc_id", "rank").collect()
    }
    assert(e2.getMessage.contains("rank must be >= 1") ||
      e2.getMessage.toUpperCase.contains("CAST"), e2.getMessage)
    val badG = Seq((0L, 10L, Some(1L)), (0L, 5L, Option.empty[Long]))
      .toDF("query_id", "doc_id", "rank")
    val eg = intercept[Exception] {
      RankFusion.rrfGrouped(Seq(badG), "query_id", "doc_id", "rank").collect()
    }
    assert(eg.getMessage.contains("rank must be >= 1"), eg.getMessage)
  }
}
