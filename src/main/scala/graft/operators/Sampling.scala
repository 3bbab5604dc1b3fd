package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling and corpus mixing for training-data
  * pipelines.
  *
  * Everything keys off a 64-bit content/id hash, NOT rand(): the same
  * row lands on the same side of every cut across runs, partitionings,
  * and cluster sizes — so samples are reproducible, train/eval splits
  * never leak when data is re-processed, and downstream incremental
  * runs see stable membership. All pure column expressions: sampling
  * is a pushed-down filter (no shuffle), mixing is a union of filters.
  */
object Sampling {

  private val Buckets = 1L << 20

  /** Hash bucket in [0, Buckets) for a key column under a seed. */
  private def bucket(key: Column, seed: Long): Column =
    pmod(xxhash64(lit(seed), key), lit(Buckets))

  /** Keep ~fraction of rows, deterministically by id hash. */
  def hashSample(df: DataFrame, idCol: String, fraction: Double,
                 seed: Long = 0L): DataFrame = {
    require(fraction >= 0 && fraction <= 1, s"bad fraction $fraction")
    df.filter(bucket(col(idCol), seed) < lit((fraction * Buckets).toLong))
  }

  /** Disjoint deterministic split (e.g. train/val/test). Weights are
    * normalized; every row lands in exactly one part under the seed. */
  def split(df: DataFrame, idCol: String, weights: Seq[Double],
            seed: Long = 0L): Seq[DataFrame] = {
    require(weights.nonEmpty && weights.forall(_ >= 0) && weights.sum > 0,
      s"bad weights $weights")
    val cum = weights.map(_ / weights.sum).scanLeft(0.0)(_ + _)
    val cuts = cum.map(c => (c * Buckets).toLong)
    cuts.zip(cuts.tail).map { case (lo, hi) =>
      df.filter(bucket(col(idCol), seed) >= lit(lo) &&
                bucket(col(idCol), seed) < lit(hi))
    }
  }

  /** Weighted mixture of corpora: keep wᵢ of corpus i (wᵢ ∈ [0,1] —
    * down-sampling rates, the usual shape of a training-data mixing
    * recipe), union by name. Deterministic per (corpus index, id). */
  def mixture(corpora: Seq[(DataFrame, Double)], idCol: String,
              seed: Long = 0L): DataFrame = {
    require(corpora.nonEmpty, "no corpora")
    corpora.zipWithIndex.map { case ((df, w), i) =>
      hashSample(df, idCol, w, seed = seed ^ (i.toLong << 32))
    }.reduce(_ unionByName _)
  }

  /** Temperature-based corpus rebalancing (the multilingual-pretraining
    * recipe: sample groups proportional to pᵢ^α, α ∈ (0,1], so
    * high-resource groups shrink and the mixture flattens — Conneau &
    * Lample 2019 §3.1). Downsampling-only formulation: group g with
    * count c_g keeps rate r_g = (c_min / c_g)^(1-α), giving surviving
    * counts ∝ c_g^α with the smallest group kept whole (a filter
    * engine cannot up-sample; callers wanting replication compose with
    * an explode). α = 1 keeps everything; α → 0 flattens toward the
    * smallest group's size.
    *
    * Determinism/mirroring: membership is the usual xxhash64 bucket
    * cut. For α = 0.5 the rate is `sqrt(c_min/c_g)` — sqrt and the
    * bucket-cut arithmetic are exactly-rounded IEEE ops, so a SQL
    * oracle reproduces membership bit-exactly (`pow` for general α is
    * correctly-rounded on neither JVM nor DuckDB, so only the α = 0.5
    * gate is hash-checked; other α are spec-tested in-Scala).
    *
    * Scale shape: ONE map-side-combined count aggregate over the
    * corpus (the shuffle carries distinct groups per partition), a
    * scalar c_min off that bounded table, then a group-keyed
    * AQE-broadcast join of the cut table back onto the corpus and a
    * pushable hash filter — no corpus shuffle. */
  def temperatureSample(df: DataFrame, idCol: String, groupCol: String,
                        alpha: Double, seed: Long = 0L): DataFrame = {
    require(alpha > 0 && alpha <= 1, s"alpha must be in (0,1], got $alpha")
    // materialized: consumed by the scalar c_min AND the join below —
    // without truncation each consumer re-runs the corpus count
    val counts = Materialize(df.groupBy(groupCol).count())
    val cMin = counts.agg(min(col("count"))).head.getLong(0)
    val rate =
      if (alpha == 0.5) sqrt(lit(cMin.toDouble) / col("count").cast("double"))
      else pow(lit(cMin.toDouble) / col("count").cast("double"), lit(1.0 - alpha))
    val cuts = counts.select(col(groupCol),
      floor(rate * lit(Buckets.toDouble)).as("__graft_cut"))
    df.join(cuts, Seq(groupCol))
      .filter(bucket(col(idCol), seed) < col("__graft_cut"))
      .drop("__graft_cut")
      .select(df.columns.map(col).toSeq: _*)
  }

  /** Per-group quota: keep at most `maxPerGroup` rows per `groupCol`
    * value — the crawl-pipeline domain cap ("no single site dominates
    * the corpus"). Selection is a uniform-but-reproducible sample:
    * rows rank by (xxhash64(id), id) inside their group, independent
    * of partitioning and ingest order, so re-processing keeps the same
    * rows and incremental runs see stable membership.
    *
    * Scale shape: ONE shuffle on the group key; rank<=k optimizes to
    * WindowGroupLimit (per-partition top-k heaps before and after the
    * exchange), so the shuffle carries at most maxPerGroup rows per
    * group per map partition — a skewed giant group never materializes
    * on one task beyond its k winners. */
  def groupQuota(df: DataFrame, idCol: String, groupCol: String,
                 maxPerGroup: Int): DataFrame = {
    require(maxPerGroup >= 1, s"bad maxPerGroup $maxPerGroup")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(xxhash64(col(idCol)), col(idCol))
    // rank column name must not collide with any user column
    val rk = Iterator.from(0).map(i => s"__graft_rk_$i")
      .find(n => !df.columns.contains(n)).get
    df.withColumn(rk, row_number().over(w))
      .filter(col(rk) <= maxPerGroup)
      .drop(rk)
  }

  /** Per-group EXACT percentile trim: drop rows whose `valueCol`
    * exceeds the group's q-quantile (the length-outlier cut every
    * quality pipeline runs before training). The threshold for group
    * g is the smallest value v with |{rows ≤ v}| ≥ ⌈q·n_g⌉; rows with
    * value ≤ threshold survive — tie-INCLUSIVE, so membership never
    * depends on row order and the result is deterministic without an
    * id tiebreak.
    *
    * Scale shape — exact order statistics WITHOUT sorting rows:
    * aggregate a (group, value) histogram first (map-side combined;
    * its size is the group×distinct-value DOMAIN, independent of row
    * count), run the cumulative window over the histogram (partitions
    * are domain-sized, never row-sized — a skewed giant group costs
    * its distinct values, not its rows), then join the
    * group-cardinality threshold table back (AQE broadcasts it) and
    * filter. NULL values never survive (NULL ≤ t is NULL → dropped).
    */
  def percentileTrim(df: DataFrame, groupCol: String, valueCol: String,
                     q: Double): DataFrame = {
    require(q > 0 && q <= 1, s"quantile must be in (0,1], got $q")
    import org.apache.spark.sql.expressions.Window
    // the quantile is over NON-NULL values (engines disagree on where
    // NULL sorts in a window; excluding it makes the threshold — and
    // therefore membership — engine-independent)
    val hist = df.filter(col(valueCol).isNotNull)
      .groupBy(col(groupCol), col(valueCol)).agg(count(lit(1)).as("__c"))
    val cumW = Window.partitionBy(groupCol).orderBy(valueCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = hist
      .withColumn("__cum", sum("__c").over(cumW))
      .withColumn("__n", sum("__c").over(Window.partitionBy(groupCol)))
    val thresh = cum
      .filter(col("__cum") >= ceil(lit(q) * col("__n")))
      .groupBy(col(groupCol)).agg(min(col(valueCol)).as("__t"))
    df.join(thresh, Seq(groupCol))
      .filter(col(valueCol) <= col("__t"))
      .drop("__t")
  }

  /** k-anonymity suppression: drop every row whose quasi-identifier
    * combination (the `quasiCols` tuple) occurs fewer than `k` times —
    * the release-gate guarantee that no published row is identifiable
    * within a group smaller than k (Sweeney 2002). The complement of
    * [[graft.operators.Pii]]'s direct-identifier scrub: PII redaction
    * removes explicit identifiers, k-anonymity removes rows that
    * quasi-identifiers would single out.
    *
    * Scale shape: combo counts via map-side-combined groupBy (a hot
    * combo never buffers one task — a `count over (partition by
    * quasi)` window would), the ≥k combo set joined back on the combo
    * key (AQE broadcasts when it is small, shuffles both sides
    * co-partitioned when not) as a plain filter. NULL quasi values
    * group together (null-safe key semantics), matching the mirror's
    * GROUP BY. */
  def kAnonymize(df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 1, "k must be >= 1")
    // the combo table's key columns are RENAMED before the join —
    // both sides derive from `df`, and same-named columns from shared
    // lineage resolve ambiguously (Spark's "trivially true equals"
    // trap)
    val combos = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("__n"))
      .filter(col("__n") >= k)
      .select(quasiCols.map(q => col(q).as(s"__q_$q")): _*)
    // null-safe equality: a NULL-valued combo with >= k rows is kept,
    // matching the groupBy that counted it
    val cond = quasiCols.map(q => col(q) <=> col(s"__q_$q")).reduce(_ && _)
    df.join(combos, cond, "left_semi")
  }
}
