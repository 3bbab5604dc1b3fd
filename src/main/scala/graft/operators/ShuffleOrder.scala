package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.XxHash64
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.{toColumn, toExpr}

/** Deterministic global corpus shuffle — the "randomize training
  * order" step every LLM pretraining pipeline runs between curation
  * and packing (per-epoch document order must look random to SGD but
  * be exactly reproducible for restarts and audits). Assigns each
  * document a dense global position `pos ∈ [0, n)` in the order of a
  * seeded 64-bit hash of its id: uniform, seed-switchable per epoch,
  * and independent of partitioning/ingest order.
  *
  * Scale shape: a naive `orderBy(hash)` + `row_number()` over an
  * empty window ships the whole corpus through ONE task. Instead the
  * hash's own top `shardBits` bits define range shards (uniform by
  * hash avalanche, and order-aligned: every key in shard s is
  * unsigned-below every key in shard s+1), so the global rank
  * decomposes into a per-shard `row_number` (one exchange, each
  * shard sorted by its own task) plus a shard base offset from a
  * `shards`-row count table (bounded driver-free prefix sum,
  * broadcast back — never a shuffle join). ONE full-data shuffle
  * total; the count table's side pass re-reads ONLY the id column
  * (column-pruned scan, map-side-combining aggregate — at 100 TB
  * that second pass is a few per-mille of the payload IO, cheaper
  * than materializing the windowed table to avoid it). The shard
  * count is the parallelism knob (default 256; at 100 TB raise
  * `shardBits` so a shard's rows fit one task's sort spill budget).
  *
  * Within a shard all keys share their top bit (shardBits ≥ 1), so
  * SIGNED long comparison agrees with the unsigned global order —
  * the per-shard sort needs no unsigned trickery. Ties (hash
  * collisions) break on the id, making the permutation total and
  * deterministic.
  *
  * Reference frame: himanshug/druid-hadoop-utils stops at handing
  * segments to Hadoop; ordering for downstream training is the kind
  * of pipeline step its users script by hand. This is that step as a
  * first-class scale-safe operator.
  */
object ShuffleOrder {

  /** Seeded xxhash64 of one column (Spark's own XXH64 expression, so
    * the DuckDB mirror in [[graft.queries.SqlHash.xxh64LongSteps]]
    * reproduces it bit-for-bit). */
  def seededHash(c: Column, seed: Long): Column =
    toColumn(new XxHash64(Seq(toExpr(c)), seed))

  /** One row per input row: all input columns plus `pos` (dense
    * global shuffle position, 0-based) and `shard` (the hash range
    * shard holding the row). `idCol` must be long-typed and unique —
    * hash ties break on it, so duplicate ids would make the
    * permutation depend on partitioning. */
  def order(df: DataFrame, idCol: String, seed: Long,
            shardBits: Int = 8): DataFrame =
    orderImpl(df, idCol, seed, shardBits, ntokCol = None)

  /** Curriculum ordering: positions ascend by `bucketCol` FIRST
    * (easy→hard stages: length class, quality band, difficulty
    * score), pseudo-randomly WITHIN each bucket — the curriculum-
    * learning data order. Built on the same key machinery: the sort
    * key packs the bucket into the top `bucketBits` bits above the
    * hash's top bits, so bucket-major/hash-minor order IS unsigned
    * key order and the whole [[order]] decomposition (range shards,
    * per-shard rank, broadcast offsets) applies unchanged. Buckets
    * must be in [0, 2^bucketBits) — enforced per row. With
    * `shardBits > bucketBits` every bucket still splits across
    * 2^(shardBits−bucketBits) shards, so one giant stage cannot
    * serialize into one task. */
  def curriculumOrder(df: DataFrame, idCol: String, bucketCol: String,
                      seed: Long, bucketBits: Int = 4,
                      shardBits: Int = 8): DataFrame = {
    require(bucketBits >= 1 && bucketBits < 20, s"bad bucketBits $bucketBits")
    require(shardBits >= bucketBits,
      s"shardBits ($shardBits) must be >= bucketBits ($bucketBits)")
    orderImpl(df, idCol, seed, shardBits,
      ntokCol = None, bucket = Some((bucketCol, bucketBits)))
  }

  /** [[curriculumOrder]] + [[orderWithTokens]]'s `tok_start` — feeds
    * [[tokenBudget]] for "the first B tokens of the curriculum". */
  def curriculumOrderWithTokens(df: DataFrame, idCol: String,
                                bucketCol: String, ntokCol: String,
                                seed: Long, bucketBits: Int = 4,
                                shardBits: Int = 8): DataFrame = {
    require(bucketBits >= 1 && bucketBits < 20, s"bad bucketBits $bucketBits")
    require(shardBits >= bucketBits,
      s"shardBits ($shardBits) must be >= bucketBits ($bucketBits)")
    orderImpl(df, idCol, seed, shardBits,
      ntokCol = Some(ntokCol), bucket = Some((bucketCol, bucketBits)))
  }

  /** [[order]] plus `tok_start`: each document's first token's offset
    * in the global shuffled token stream (`ntokCol` = per-doc token
    * count, tokenizer-agnostic). The running sum shares the rank's
    * window pass — same partition/order spec, so Catalyst evaluates
    * both in ONE Window node behind the same single exchange — and
    * the base table carries (row count, token total) per shard. */
  def orderWithTokens(df: DataFrame, idCol: String, ntokCol: String,
                      seed: Long, shardBits: Int = 8): DataFrame =
    orderImpl(df, idCol, seed, shardBits, ntokCol = Some(ntokCol))

  private def orderImpl(df: DataFrame, idCol: String, seed: Long,
                        shardBits: Int, ntokCol: Option[String],
                        bucket: Option[(String, Int)] = None): DataFrame = {
    require(shardBits >= 1 && shardBits <= 20,
      s"shardBits must be in [1,20], got $shardBits")
    // reject EVERY output and internal working column, not just
    // pos/shard — an input carrying __k/__rn/… (e.g. re-ordering a
    // previously ordered table) would be silently overwritten/dropped
    val reserved = Seq("pos", "shard", "__k", "__rn", "__base", "__ct",
      "__tbase") ++ (if (ntokCol.isDefined) Seq("tok_start") else Nil)
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input columns collide with ShuffleOrder internals: " +
        s"${clash.toSeq.sorted.mkString(", ")} — rename or drop them " +
        "(re-ordering ordered output: drop pos/shard/tok_start first)")
    val hash = seededHash(col(idCol).cast("long"), seed)
    // curriculum key: bucket in the TOP bucketBits bits, hash's top
    // bits below — unsigned key order = (bucket asc, hash asc)
    val key = bucket match {
      case Some((bc, bb)) =>
        val b = col(bc).cast("long")
        val checked = when(b.isNull || b < 0L || b >= (1L << bb),
          raise_error(concat(lit(s"curriculum bucket outside [0, ${1L << bb}): "),
            b.cast("string")))).otherwise(b)
        shiftleft(checked, 64 - bb).bitwiseOR(shiftrightunsigned(hash, bb))
      case None => hash
    }
    val keyed = df
      .withColumn("__k", key)
      .withColumn("shard", shiftrightunsigned(col("__k"), 64 - shardBits))
    // per-shard rank (and token prefix sum, when asked): the ONE data
    // exchange (hash partition by shard, task-local sort). Both window
    // functions share the partition/order spec, so they run in one
    // Window node — the ROWS frame applies only to the sum.
    val w = Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    val wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked0 = keyed.withColumn("__rn", row_number().over(w).cast("long"))
    val ranked = ntokCol match {
      case Some(n) => ranked0.withColumn("__ct",
        sum(col(n).cast("long")).over(wsum) - col(n).cast("long"))
      case None => ranked0
    }
    // shard base offsets: shards-row table (≤ 2^shardBits, bounded by
    // construction) — prefix sums over the single tiny partition, then
    // broadcast back. No corpus data crosses this path; its aggregate
    // re-reads only the id (+ntok) columns, map-side combined.
    val wb = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val aggs = count(lit(1)).as("__c") +:
      ntokCol.map(n => sum(col(n).cast("long")).as("__t")).toSeq
    val bases0 = keyed.groupBy(col("shard")).agg(aggs.head, aggs.tail: _*)
      .withColumn("__base", sum(col("__c")).over(wb) - col("__c"))
    val bases = ntokCol match {
      case Some(_) => bases0
        .withColumn("__tbase", sum(col("__t")).over(wb) - col("__t"))
        .select(col("shard"), col("__base"), col("__tbase"))
      case None => bases0.select(col("shard"), col("__base"))
    }
    val joined = ranked
      .join(broadcast(bases), "shard")
      .withColumn("pos", col("__base") + col("__rn") - 1L)
    val withTok = ntokCol match {
      case Some(_) => joined
        .withColumn("tok_start", col("__tbase") + col("__ct"))
        .drop("__ct", "__tbase")
      case None => joined
    }
    withTok.drop("__k", "__rn", "__base")
  }

  /** Write [[order]]/[[curriculumOrder]] output as `numFiles` parquet
    * files that TILE the position space: file i holds a contiguous
    * `pos` range, rows sorted by `pos` inside it — so a training
    * reader consuming files in name order streams the exact global
    * permutation without ever re-sorting. One repartitionByRange on
    * `pos` (range exchange + task-local sort); sortWithinPartitions
    * keeps the write streaming (no buffering beyond the sort spill). */
  def writeOrdered(ordered: DataFrame, path: String, numFiles: Int): Unit = {
    require(numFiles >= 1, s"bad numFiles $numFiles")
    require(ordered.columns.contains("pos"), "writeOrdered needs a pos column")
    ordered
      .repartitionByRange(numFiles, col("pos"))
      .sortWithinPartitions(col("pos"))
      .write.mode("overwrite").parquet(path)
  }

  /** Cut a corpus to EXACTLY `budget` tokens in shuffle order — the
    * "sample B tokens for this training run" step: documents are
    * taken in [[order]]'s position order until the running token
    * total reaches the budget; the boundary document is truncated so
    * the prefix sums to `budget` exactly. Output rows are the kept
    * documents with `tok_start` (the doc's first token's offset in
    * the global stream) and `tok_take` (how many of its tokens are
    * in-budget; < ntok only for the boundary doc).
    *
    * Scale shape: everything rides [[orderWithTokens]]'s single
    * exchange — the running token sum shares the rank's window pass
    * and the per-shard token totals ride the same bounded base
    * table, so the cut itself is a pure filter + projection. The
    * `tok_start < budget` filter prunes whole shards (a shard's
    * broadcast base offset bounds every row in it) before any
    * window output is retained.
    *
    * Input must be [[orderWithTokens]]'s output (pos, shard,
    * tok_start present); `ntokCol` is the same token-count column. */
  def tokenBudget(ordered: DataFrame, ntokCol: String,
                  budget: Long): DataFrame = {
    require(budget >= 0L, s"bad budget $budget")
    require(Seq("pos", "shard", "tok_start").forall(ordered.columns.contains),
      "tokenBudget input must be ShuffleOrder.orderWithTokens output " +
        "(pos, shard, tok_start)")
    ordered
      .filter(col("tok_start") < budget)
      .withColumn("tok_take",
        least(col(ntokCol).cast("long"), lit(budget) - col("tok_start")))
  }
}
