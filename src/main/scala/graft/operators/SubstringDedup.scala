package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact substring deduplication — the suffix-array dedup family of
  * Lee et al. 2022 ("Deduplicating Training Data Makes Language Models
  * Better"), re-expressed for distributed execution.
  *
  * A span of tokens is DUPLICATED when every `w`-token window inside
  * it occurs ≥ 2 times in the corpus (counting every occurrence —
  * other documents AND repeats within the same document). The operator
  * reports, per document, the maximal runs of tokens covered by
  * duplicated windows: exactly the "substring repeated ≥ `w` tokens
  * somewhere in the corpus" regions a suffix array would find, at
  * token (not byte) granularity.
  *
  * Scale design — the honest cost of exact substring dedup is one
  * narrow corpus-sized pass, same as a suffix array's ~8 bytes/byte,
  * but sharded instead of single-node:
  *  1. ONE O(tokens) expression per document emits all rolling window
  *     hashes ([[graft.functions.DupWindowHashes]]) — no window
  *     strings, no O(tokens·w) rehash.
  *  2. The exploded (id, pos, hash) table is 16-ish bytes/token and is
  *     materialized ONCE (it feeds both the occurrence count and the
  *     join back; without that, Spark would re-scan and re-hash the
  *     corpus per consumer).
  *  3. Occurrence counting is a map-side-combined `groupBy(hash)` —
  *     the only corpus-wide shuffle, on 8-byte keys.
  *  4. Duplicated hashes join back narrow (AQE broadcasts when the
  *     duplicated set is small, as it is on mostly-clean corpora); the
  *     island merge is one doc-partitioned window pass.
  * Nothing is O(pairs): a window duplicated a million times costs one
  * count row, not 10^12 comparisons.
  */
object SubstringDedup {

  /** Per-document maximal duplicated spans, 1-based token positions:
    * (id, span_start, span_end, span_toks, n_dup_windows), where
    * n_dup_windows is the number of duplicated window starts merged
    * into the span. Documents with < `w` tokens, or with no duplicated
    * window, yield no rows. Two spans merge when adjacent (next start
    * ≤ prev start + `w`), so covered-token runs are maximal. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                      w: Int = 8): DataFrame = {
    val windows = Materialize(windowTable(df, idCol, textCol, w))
    val dup = windows.groupBy("wh").agg(count(lit(1)).as("occ"))
      .filter(col("occ") >= 2).select("wh")
    val starts = windows.join(dup, "wh").select(col(idCol), col("i"))
    spansFromStarts(starts, idCol, w)
  }

  /** The exploded (id, 1-based window start, rolling window hash)
    * table — one O(tokens) expression pass per document. */
  private def windowTable(df: DataFrame, idCol: String, textCol: String,
                          w: Int): DataFrame =
    df.select(col(idCol),
        posexplode(TextFunctions.dupWindowHashes(col(textCol), w)))
      .select(col(idCol), (col("pos") + 1).cast("long").as("i"),
        col("col").as("wh"))

  /** Merge flagged window STARTS into maximal disjoint spans (two
    * starts merge when the next is ≤ prev + w): one doc-partitioned
    * window pass over the (id, i) start table. */
  private def spansFromStarts(starts: DataFrame, idCol: String,
                              w: Int): DataFrame = {
    val byDoc = Window.partitionBy(idCol).orderBy("i")
    val prev = lag(col("i"), 1).over(byDoc)
    val marked = starts.withColumn("brk",
      when(prev.isNull || col("i") > prev + w, 1).otherwise(0))
    val grouped = marked.withColumn("g",
      sum(col("brk")).over(
        byDoc.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    grouped.groupBy(col(idCol), col("g"))
      .agg(min("i").as("span_start"), (max(col("i")) + w - 1).as("span_end"),
        count(lit(1)).as("n_dup_windows"))
      .select(col(idCol), col("span_start"), col("span_end"),
        (col("span_end") - col("span_start") + 1).as("span_toks"),
        col("n_dup_windows"))
  }

  /** Spans of `df` documents covered by windows that occur ANYWHERE in
    * `probes` — the match set of decontamination-by-excision: every
    * maximal run of `df` tokens whose `w`-token windows all appear in
    * the probe texts (benchmark/eval data). Same island semantics as
    * [[duplicatedSpans]], but membership is against the probe window
    * set instead of a corpus occurrence count.
    *
    * Scale shape: the probe window set is DISTINCT hashes — eval
    * suites are tiny next to a training corpus, so the semi join is
    * AQE-broadcast in practice (and a plain 8-byte-key shuffle join
    * beyond); the corpus side stays the one O(tokens) window pass.
    * No materialize here: each side has exactly one consumer. */
  def probeMatchedSpans(df: DataFrame, idCol: String, textCol: String,
                        probes: DataFrame, probeTextCol: String,
                        w: Int = 8): DataFrame = {
    val probeWh = probes
      .select(explode(TextFunctions.dupWindowHashes(col(probeTextCol), w))
        .as("wh")).distinct()
    val starts = windowTable(df, idCol, textCol, w)
      .join(probeWh, Seq("wh"), "left_semi").select(col(idCol), col("i"))
    spansFromStarts(starts, idCol, w)
  }

  /** Decontamination-by-excision: cut every probe-matched span out of
    * the corpus (the "remove benchmark n-grams from training data"
    * step), keeping all documents — one cleaned row per input doc,
    * clean docs byte-identical. Composition of [[probeMatchedSpans]]
    * and the [[removeDuplicatedSpans]] removal machinery. */
  def exciseProbeSpans(df: DataFrame, idCol: String, textCol: String,
                       probes: DataFrame, probeTextCol: String,
                       w: Int = 8): DataFrame =
    removeSpans(df, idCol, textCol,
      probeMatchedSpans(df, idCol, textCol, probes, probeTextCol, w))

  /** The REMOVAL step of Lee-et-al substring dedup: cut every
    * [[duplicatedSpans]] region out of its document and re-join the
    * surviving tokens — one row per input document with the cleaned
    * text. Policy: EVERY duplicated occurrence is removed (the
    * strictest variant; a keep-one-copy policy is a caller-side union
    * of the canonical occurrence back in). Documents with no
    * duplicated span pass through unchanged (byte-identical: split on
    * single spaces keeps empty tokens, so re-join reproduces the
    * original spacing).
    *
    * Scale shape: spans per doc aggregate to ONE sorted struct array
    * (maximal islands are disjoint by construction, so
    * n_removed_toks = Σ span_toks with no overlap bookkeeping); the
    * corpus joins that doc-keyed span table once — re-joining the
    * text beats carrying it through the window machinery. Token
    * filtering is a single codegen HOF projection; the per-token
    * `exists` over the span array is O(tokens·spans_per_doc) with
    * spans_per_doc island-bounded (tiny on real corpora), never a
    * corpus-wide operation. */
  def removeDuplicatedSpans(df: DataFrame, idCol: String, textCol: String,
                            w: Int = 8): DataFrame =
    removeSpans(df, idCol, textCol, duplicatedSpans(df, idCol, textCol, w))

  /** Remove WITHIN-document repeated spans — the self-repetition
    * cleanup (looped boilerplate, generation stutter): cut every
    * maximal run of tokens covered by a `w`-token window that occurs
    * ≥ 2 times in the SAME document. Unlike [[removeDuplicatedSpans]]
    * (corpus-wide duplication — genuinely needs a corpus shuffle),
    * self-repetition is per-document local, so the whole operator is
    * projections over one scan: [[graft.functions.SelfDupSpans]]
    * computes hash→count→islands inside one expression, and the
    * removal HOF reads the span array directly — ZERO shuffles, zero
    * joins, at any corpus size. */
  def removeSelfRepeatedSpans(df: DataFrame, idCol: String, textCol: String,
                              w: Int = 8): DataFrame =
    df.select(col(idCol), col(textCol))
      .withColumn("spans", TextFunctions.selfDupSpans(col(textCol), w))
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("kept", expr(
        "CASE WHEN size(spans) = 0 THEN toks ELSE filter(toks, " +
          "(t, i) -> NOT exists(spans, sp -> i + 1 >= sp.s AND i + 1 <= sp.e)) END"))
      .select(col(idCol),
        array_join(col("kept"), " ").as("text_clean"),
        expr("aggregate(spans, CAST(0 AS BIGINT), (a, sp) -> a + sp.e - sp.s + 1)")
          .as("n_removed_toks"),
        size(col("spans")).cast("long").as("n_spans"))

  /** Cut the given disjoint (span_start, span_end, span_toks) regions
    * out of each document (see [[removeDuplicatedSpans]] for the
    * policy and scale notes). */
  private def removeSpans(df: DataFrame, idCol: String, textCol: String,
                          spanRows: DataFrame): DataFrame = {
    val spans = spanRows
      .groupBy(col(idCol))
      .agg(
        sort_array(collect_list(struct(col("span_start").as("s"),
          col("span_end").as("e")))).as("spans"),
        count(lit(1)).as("n_spans"),
        sum(col("span_toks")).as("n_removed_toks"))
    df.select(col(idCol), col(textCol))
      .join(spans, Seq(idCol), "left")
      .withColumn("toks", split(col(textCol), " "))
      .withColumn("kept", expr(
        "CASE WHEN spans IS NULL THEN toks ELSE filter(toks, " +
          "(t, i) -> NOT exists(spans, sp -> i + 1 >= sp.s AND i + 1 <= sp.e)) END"))
      .select(col(idCol),
        array_join(col("kept"), " ").as("text_clean"),
        coalesce(col("n_removed_toks"), lit(0L)).as("n_removed_toks"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"))
  }
}
