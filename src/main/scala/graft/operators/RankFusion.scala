package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009, the
  * standard hybrid-retrieval combiner): fuse N ranked lists by
  * `score(d) = Σ_lists 1/(k + rank_d)` — the way search/RAG stacks
  * merge lexical (BM25) with vector (ANN) or quality-prior rankings
  * without score calibration. Scores here are the integer fixed-point
  * image `10¹² div (k + rank)` summed as a long — order-equivalent to
  * real RRF to 10⁻¹² relative quantization, and EXACT: the
  * cross-engine gate hashes every fused score bit (a double 1/(k+r)
  * sum would depend on association order), same rationale as
  * tfidf/bm25's rational idf.
  *
  * Scale shape: inputs are top-k ranked lists — ALREADY bounded by
  * their upstream rankers (where the scale work lives: see
  * [[TextAnalysis.bm25TopK]], [[Similarity]]). Fusion is a unionAll
  * of k·N rows, one tiny groupBy, one bounded TakeOrdered — nothing
  * here ever touches corpus-sized data. Ties break on the id, making
  * the fused ranking total and deterministic. */
object RankFusion {

  /** Rank values must be ≥ 1 (ranked lists are 1-based here and in
    * every upstream ranker). Enforced at RUNTIME, loudly: with
    * kConst = 0 a rank of 0 would make the integer div emit NULL and
    * silently drop that list's contribution from rrf_score while
    * still counting it in n_lists — a bad rank column must fail the
    * job, not skew fused scores. NULL ranks (a null value, or a
    * failed cast from a non-numeric rank column) hit the same guard:
    * a `__r < 1` test alone would evaluate to NULL on them and fall
    * through to the .otherwise, reproducing exactly the silent-skew
    * failure mode the guard exists to close. */
  private def rankContrib(kConst: Int): Column =
    when(col("__r").isNull || col("__r") < 1L, raise_error(concat(
        lit("rrf: rank must be >= 1, got "),
        coalesce(col("__r").cast("string"), lit("NULL")))))
      .otherwise(expr(s"CAST(1000000000000 AS BIGINT) div ($kConst + __r)"))

  /** `rankings`: DataFrames each holding (`idCol`, `rankCol`) with
    * rank ≥ 1. Returns top `topK` docs: (fused_rank, id, n_lists,
    * rrf_score). Docs missing from a list simply contribute nothing
    * for it (standard RRF). */
  def rrf(rankings: Seq[DataFrame], idCol: String, rankCol: String,
          kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    require(kConst >= 0, s"bad kConst $kConst")
    require(topK >= 1, s"bad topK $topK")
    require(idCol != "__r" && idCol != "__c",
      s"idCol collides with an internal column name: $idCol")
    // the rank column is re-aliased to a fixed internal name BEFORE the
    // expr() — interpolating a caller-supplied column name into a SQL
    // string breaks (or silently misresolves) on non-identifier names
    val contribs = rankings.map(df =>
      df.select(col(idCol), col(rankCol).cast("long").as("__r"))
        .select(col(idCol), rankContrib(kConst).as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("__c")).as("rrf_score"))
      .orderBy(col("rrf_score").desc, col(idCol).asc)
      .limit(topK)
    // rank over the topK collected rows — bounded single-partition window
    val w = Window.orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .select(col("fused_rank"), col(idCol), col("n_lists"), col("rrf_score"))
  }

  /** [[rrf]] PER GROUP — the multi-query hybrid-retrieval combiner:
    * each ranking carries (`groupCol`, `idCol`, `rankCol`) rows (e.g.
    * per-query BM25 top-k from
    * [[TextAnalysis.bm25TopKMulti]] beside a per-query ANN list or a
    * replicated quality prior), and fusion runs independently within
    * each group. Same integer fixed-point contributions, same
    * (score desc, id asc) total order.
    *
    * Scale shape: inputs are per-group top-k lists — k·N·groups rows,
    * bounded by their upstream rankers; the fuse is one
    * (group, id)-keyed map-side-combined groupBy and the per-group
    * `rank ≤ topK` plans as WindowGroupLimit (bounded heaps), never a
    * per-group sort of anything corpus-sized. */
  def rrfGrouped(rankings: Seq[DataFrame], groupCol: String, idCol: String,
                 rankCol: String, kConst: Int = 60, topK: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "no rankings to fuse")
    require(kConst >= 0, s"bad kConst $kConst")
    require(topK >= 1, s"bad topK $topK")
    require(!Seq(groupCol, idCol).exists(Set("__r", "__c")),
      s"column collides with an internal name: $groupCol/$idCol")
    val contribs = rankings.map(df =>
      df.select(col(groupCol), col(idCol), col(rankCol).cast("long").as("__r"))
        .select(col(groupCol), col(idCol), rankContrib(kConst).as("__c")))
    val fused = contribs.reduce(_ unionByName _)
      .groupBy(col(groupCol), col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("__c")).as("rrf_score"))
    val w = Window.partitionBy(groupCol)
      .orderBy(col("rrf_score").desc, col(idCol).asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topK)
      .select(col(groupCol), col("fused_rank"), col(idCol),
        col("n_lists"), col("rrf_score"))
  }
}
