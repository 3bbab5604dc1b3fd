package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Leakage-safe split: the whole point is the invariant that no
  * near-dup pair ever straddles train/val — pin it directly, plus
  * the bucket arithmetic and the valPct edges. */
class LeakageSplitSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private lazy val docs =
    graft.Tables.documents(spark, sf()).select("doc_id", "text")

  test("no near-dup pair straddles the split (the leakage invariant)") {
    val split = Dedup.leakageSafeSplit(docs, "doc_id", "text",
      threshold = 0.8, valPct = 10, seed = 7L)
    val side = split.select(col("doc_id"), col("split"))
    val pairs = Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8)
    val straddling = pairs
      .join(side.withColumnRenamed("doc_id", "a_id")
        .withColumnRenamed("split", "sa"), Seq("a_id"))
      .join(side.withColumnRenamed("doc_id", "b_id")
        .withColumnRenamed("split", "sb"), Seq("b_id"))
      .filter(col("sa") =!= col("sb")).count()
    assert(straddling == 0L)
    // and the split is non-trivial on the fixture: both sides present
    val sides = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(sides.keySet == Set("train", "val"), s"got $sides")
  }

  test("bucket = pmod(seededHash(cluster_id), 100); split is cluster-constant") {
    val split = Dedup.leakageSafeSplit(docs, "doc_id", "text",
      threshold = 0.8, valPct = 10, seed = 7L)
    val bad = split.withColumn("expect",
        pmod(ShuffleOrder.seededHash(col("cluster_id"), 7L), lit(100L))
          .cast("int"))
      .filter(col("bucket") =!= col("expect") ||
        (col("split") === "train") =!= (col("bucket") < 90)).count()
    assert(bad == 0L)
    val multiSplit = split.groupBy("cluster_id")
      .agg(count_distinct(col("split")).as("n")).filter(col("n") > 1).count()
    assert(multiSplit == 0L)
  }

  test("valPct edges: 0 -> all train, 100 -> all val") {
    val all = Dedup.leakageSafeSplit(docs.limit(50), "doc_id", "text",
      valPct = 0).select("split").distinct().collect().map(_.getString(0))
    assert(all.toSeq == Seq("train"))
    val none = Dedup.leakageSafeSplit(docs.limit(50), "doc_id", "text",
      valPct = 100).select("split").distinct().collect().map(_.getString(0))
    assert(none.toSeq == Seq("val"))
  }
}
