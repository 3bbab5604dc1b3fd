package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TextFunctions

/** DSIR-shaped data selection: score every raw document by how much
  * its hashed n-gram feature distribution looks like a TARGET corpus
  * (Xie et al. 2023, "Data Selection for Language Models via
  * Importance Resampling" — hashed unigram+bigram bag features,
  * target-vs-raw bucket statistics, per-document importance score).
  * The downstream "keep the top mass" step composes with the existing
  * ranking/sampling operators (top-k, [[ShuffleOrder]],
  * temperature_sample) — this operator owns the statistics and the
  * scoring, the genuinely corpus-scale parts.
  *
  * One documented deviation from the paper, same rationale as
  * ngram_familiarity's counts-not-log-probabilities: the per-document
  * score is Σ over feature occurrences of the FIXED-POINT likelihood
  * ratio `fp·(t_b+1) div (r_b+1)` (Laplace-smoothed target vs raw
  * bucket counts), not Σ log-ratio. Integer end-to-end ⇒ the DuckDB
  * oracle replays every score bit (an `ln` would hash differently
  * across engines); at the filtering tails, ranking by mean ratio and
  * by mean log-ratio flag the same documents. The bucket-independent
  * global factor (R+B)/(T+B) of the true smoothed ratio is dropped —
  * it rescales every score identically and cannot change any ranking.
  *
  * Scale shape: pass 1 is one corpus scan → per-bucket counts —
  * map-side combined on ≤ `buckets` keys, collected as AT MOST
  * `buckets` rows (an explicitly bounded driver action, the SQ8-bounds
  * idiom — buckets is caller-set, default 4096 ≈ 64 KB); pass 2 is a
  * pure zero-shuffle codegen projection ([[graft.functions.
  * LinearTextScore]] with the learned table supplied — the same
  * trained-weights entry point the quality classifier uses). The
  * feature stream of BOTH passes is one shared definition
  * ([[graft.functions.FeatureBuckets]] reifies exactly what
  * LinearTextScore reads), so statistics and inference cannot drift.
  */
object ImportanceSelection {

  /** Per-document DSIR importance scores.
    *
    * @param isTarget  boolean Column over `df`'s columns marking the
    *                  target (curated) subset; raw = ALL rows. Target
    *                  ⊆ raw keeps every smoothed ratio ≤ fp·(t+1)/(t+1)
    *                  ≤ fp bounded, so per-doc sums stay long-exact.
    * @param buckets   hashed feature space size (the paper uses 10⁴);
    *                  also the driver-collect bound of pass 1.
    * @param fixedPoint ratio quantization (10⁶ ⇒ ~6 significant
    *                  digits; per-doc score ≤ fp·features fits a long
    *                  for any document). */
  def dsirScores(df: DataFrame, idCol: String, textCol: String,
                 isTarget: Column, buckets: Int = 4096,
                 fixedPoint: Long = 1000000L): DataFrame = {
    require(buckets > 0, s"buckets must be positive, got $buckets")
    require(fixedPoint > 0, s"fixedPoint must be positive, got $fixedPoint")
    // pass 1: bucket statistics — bounded to `buckets` rows by
    // construction (groupBy key domain = [0, buckets))
    val counted = df
      .select(isTarget.cast("boolean").as("__tgt"),
        explode(TextFunctions.featureBuckets(
          lower(col(textCol)), buckets)).as("__b"))
      .groupBy(col("__b"))
      .agg(sum(when(col("__tgt"), 1L).otherwise(0L)).as("t"),
        count(lit(1)).as("r"))
      .collect()
    val w = new Array[Long](buckets)
    // buckets no feature hashed to: the same formula at t=r=0 (the
    // neutral ratio) — unreachable from this corpus, present so the
    // table is total
    java.util.Arrays.fill(w, fixedPoint)
    counted.foreach { row =>
      val b = row.getLong(0).toInt
      // floor division on non-negative longs — DuckDB's `//` exactly
      w(b) = fixedPoint * (row.getLong(1) + 1L) / (row.getLong(2) + 1L)
    }
    // pass 2: zero-shuffle codegen projection with the learned table
    val score = TextFunctions.linearTextScore(
      lower(col(textCol)), buckets, 1, Some(w))
    val nFeat = (size(split(col(textCol), " ", -1)) * 2 - 1).cast("long")
    df.select(col(idCol),
      nFeat.as("n_features"),
      score.as("dsir_score"),
      // one int-derived double division — identical bits cross-engine
      // while score < 2^53 (gate scale; at extreme corpus×fp products
      // rank on dsir_score, which is exact at any scale)
      (score.cast("double") / (nFeat * fixedPoint).cast("double"))
        .as("dsir_avg"))
  }
}
