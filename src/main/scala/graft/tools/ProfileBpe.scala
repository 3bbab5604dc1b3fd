package graft.tools

import graft.Tables
import graft.operators.BpeTrainer
import org.apache.spark.sql.SparkSession

/** Measure a REALISTIC BPE training run: `numMerges` (default 8192)
  * over the documents table of `SPARK_GRAFT_SF_DIR`. The adaptive
  * in-memory path (BpeTrainer.bpeMerges) takes one distributed word
  * count + a driver merge loop; this prints both phases so SCALING.md
  * carries a measured number, not a by-construction claim.
  *
  * Usage: SPARK_GRAFT_SF_DIR=localdata/sf1 runMain graft.tools.ProfileBpe [merges]
  */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val numMerges = if (args.nonEmpty) args(0).toInt else 8192
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1000000).selectExpr("sum(id)").collect() // JVM warm-up
    // "compound" mode pairs adjacent words into w1+w2 tokens: the
    // synthetic corpus has only ~310 distinct words (merge supply dries
    // up near ~400 merges/copy tier), so squaring the vocabulary is how
    // the loop gets driven to a REAL 8k+ merge depth on this data
    val raw = Tables.documents(spark, sfDir).select("text")
    val docs =
      if (args.length > 1 && args(1) == "compound")
        raw.selectExpr(
          """array_join(transform(
            |  sequence(0, (size(split(text, ' ')) div 2) - 1),
            |  i -> concat(split(text, ' ')[2*i], '+', split(text, ' ')[2*i+1])),
            |' ') AS text""".stripMargin)
      else raw
    val nDocs = docs.count()
    val t0 = System.nanoTime()
    val merges = BpeTrainer.bpeMerges(docs, "text", numMerges)
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[bpe] dir=$sfDir docs=$nDocs requested=$numMerges " +
      f"learned=${merges.size} total=$sec%.2f s " +
      f"(last merge: ${merges.lastOption.getOrElse(("", "", "", 0L))})")
  }
}
