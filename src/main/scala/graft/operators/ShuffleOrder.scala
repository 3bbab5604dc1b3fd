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
            shardBits: Int = 8): DataFrame = {
    require(shardBits >= 1 && shardBits <= 20,
      s"shardBits must be in [1,20], got $shardBits")
    require(!df.columns.contains("pos") && !df.columns.contains("shard"),
      "input already has a pos/shard column")
    val keyed = df
      .withColumn("__k", seededHash(col(idCol).cast("long"), seed))
      .withColumn("shard", shiftrightunsigned(col("__k"), 64 - shardBits))
    // per-shard rank: the ONE data exchange (hash partition by shard,
    // task-local sort). ROWS frame irrelevant for row_number.
    val w = Window.partitionBy(col("shard")).orderBy(col("__k"), col(idCol))
    val ranked = keyed.withColumn("__rn", row_number().over(w).cast("long"))
    // shard base offsets: shards-row table (≤ 2^shardBits, bounded by
    // construction) — prefix sum over the single tiny partition, then
    // broadcast back. No corpus data crosses this path.
    val wb = Window.orderBy(col("shard"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val bases = keyed.groupBy(col("shard")).agg(count(lit(1)).as("__c"))
      .withColumn("__base", sum(col("__c")).over(wb) - col("__c"))
      .select(col("shard"), col("__base"))
    ranked
      .join(broadcast(bases), "shard")
      .withColumn("pos", col("__base") + col("__rn") - 1L)
      .drop("__k", "__rn", "__base")
  }
}
