package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.graftbridge.toColumn
import org.apache.spark.sql.types.BinaryType
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-prefiltered semi-join: the runtime-filter pattern, explicit.
  *
  * When the key side of a selective semi-join is too large to
  * broadcast as a hash relation but its MEMBERSHIP fits a few
  * megabytes of bloom bits, shuffling the full probe side is the
  * dominant waste: most probe rows would be dropped by the join
  * anyway. Building a bloom filter over the key side (one distributed
  * pass, partial blooms OR-merged) and applying `might_contain` in the
  * probe side's scan stage drops non-members BEFORE the shuffle — the
  * exchange then carries ~(selectivity + fpp) of the probe rows, and
  * the exact join that follows removes the false positives, so the
  * result is byte-identical to the plain semi-join (oracle-gated by
  * q_bloom_join, row-equality spec-pinned).
  *
  * Spark injects this itself (InjectRuntimeFilter) only for shuffle
  * joins with usable creation-side stats under AQE; this operator
  * makes the plan shape available unconditionally — any source, any
  * downstream join strategy, caller-controlled sizing.
  *
  * Uses Spark's own BloomFilterAggregate / BloomFilterMightContain
  * expressions (both codegen'd; the probe stays inside whole-stage
  * codegen) with the same XxHash64 hashing InjectRuntimeFilter wires
  * up. The built bloom is `optimalNumOfBits(expectedItems, fpp)` bits
  * — e.g. ~1.2 MB for 1M keys at 1% — embedded in the plan as a
  * binary literal exactly like the injected filter's subquery result.
  */
object BloomJoin {

  /** Serialized bloom filter over `key` of `df` — ONE aggregate pass,
    * map-side partial blooms merged by OR. The only driver-collected
    * value is the bloom itself (size fixed by expectedItems/fpp,
    * independent of row count). */
  def bloomOf(df: DataFrame, key: String,
              expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    require(expectedItems > 0, s"expectedItems must be > 0, got $expectedItems")
    require(fpp > 0 && fpp < 1, s"fpp must be in (0,1), got $fpp")
    val numBits = BloomFilter.optimalNumOfBits(expectedItems, fpp)
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(org.apache.spark.sql.graftbridge.toExpr(df(key)))),
      Literal(expectedItems), Literal(numBits))
    df.select(toColumn(agg.toAggregateExpression()))
      .head.getAs[Array[Byte]](0)
  }

  /** `might_contain(bloom, xxhash64(key))` as a Column — NULL keys
    * yield NULL (row dropped by a filter), matching equi-join
    * semantics where NULL never matches. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    toColumn(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(org.apache.spark.sql.graftbridge.toExpr(key)))))

  /** Exact left-semi join of `big` on `bigKey` ∈ `small.smallKey`,
    * bloom-prefiltered: non-member `big` rows drop in the scan stage,
    * before the join exchange; the semi-join then removes the bloom's
    * false positives. Result ≡ plain `left_semi` join.
    *
    * `expectedItems <= 0` sizes the bloom on the small side's REAL
    * count (one cheap aggregate pass, floor 1024) instead of a
    * scale-blind constant: an undersized bloom blows its fpp at scale
    * (the prefilter stops filtering, silently), an oversized one
    * embeds megabytes of bits into EVERY downstream task binary
    * (observed: a 1.2 MB literal for a 30k-key side, broadcast with
    * every stage). The result is identical either way — fpp only
    * moves how many false positives the exact semi-join removes. */
  def semi(big: DataFrame, small: DataFrame, bigKey: String, smallKey: String,
           expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val items =
      if (expectedItems > 0) expectedItems
      else math.max(1024L, small.count())
    val bloom = bloomOf(small, smallKey, items, fpp)
    big.where(mightContain(bloom, big(bigKey)))
      .join(small.select(small(smallKey).as(bigKey)), Seq(bigKey), "left_semi")
  }
}
