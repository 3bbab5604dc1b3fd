package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Persisted MinHash dedup index: build-once over a reference corpus,
  * probe-many — probing must equal the inline bipartite dedup
  * (minhashPairsAgainst) on the same split, read banding parameters
  * from the index meta, and reuse the STORED reference shingles. */
class MinhashIndexSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf())
  private lazy val path = {
    val p = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_mhindex_spec_${java.util.UUID.randomUUID}").getAbsolutePath
    Dedup.writeMinhashIndex(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", p)
    p
  }

  test("probe equals the inline bipartite dedup on the same split") {
    val probe = Dedup.probeMinhashIndex(spark, path,
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    val inline = Dedup.minhashPairsAgainst(
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text",
        docs.filter(col("doc_id") % 2 === 1), "doc_id", "text",
        threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1),
        math.round(r.getDouble(2) * 1e12))).toSet
    assert(probe.nonEmpty, "fixture should contain cross-split near-dups")
    assert(probe == inline)
  }

  test("meta pins the banding parameters") {
    val meta = spark.read.parquet(s"$path/meta").collect()(0)
    assert(meta.getAs[Int]("shingleN") == 3)
    assert(meta.getAs[Int]("numHashes") == 64)
    assert(meta.getAs[Int]("bandRows") == 2)
    assert(meta.getAs[Int]("maxBucketSize") == 1000)
  }

  test("stored shingle identities equal a fresh recompute (same hashing as the signatures)") {
    val stored = spark.read.parquet(s"$path/shingles")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val fresh = docs.filter(col("doc_id") % 2 === 1)
      .select(col("doc_id"),
        graft.functions.TextFunctions.shingleHashes(col("text"), 3).as("sh"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    assert(stored == fresh)
  }

  test("small probe broadcasts; the stored band table is not a broadcast build side") {
    val plan = Dedup.probeMinhashIndex(spark, path,
        docs.filter(col("doc_id") % 2 === 0), "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("degenerate reference buckets are capped at build, not at probe") {
    val s2 = spark
    import s2.implicits._
    // 50 identical reference docs -> every band bucket holds all 50
    // ids; cap 10 drops them at build so the index carries no
    // degenerate bucket and probing yields no candidates from them
    val ref = (0 until 50).map(i => (i.toLong, "x y z x y z")).toDF("doc_id", "text")
    val p2 = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_mhindex_cap_${java.util.UUID.randomUUID}").getAbsolutePath
    Dedup.writeMinhashIndex(ref, "doc_id", "text", p2, maxBucketSize = 10)
    assert(spark.read.parquet(s"$p2/bands").count() == 0)
    val probe = (100 until 102).map(i => (i.toLong, "x y z x y z")).toDF("doc_id", "text")
    assert(Dedup.probeMinhashIndex(spark, p2, probe, "doc_id", "text").count() == 0)
  }
}
