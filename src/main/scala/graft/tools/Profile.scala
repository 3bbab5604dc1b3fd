package graft.tools

import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc stage profiler for slow bench queries. */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label%-40s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val docsRaw = Tables.documents(spark, sfDir)
    time("docs count")(docsRaw.count())
    val docs = docsRaw.select(col("doc_id").as("id"),
      TextFunctions.minhashSigText(col("text"), 3, 128).as("sig"))
    time("fused sig")(docs.agg(count(lit(1))).collect())
    time("fused sig again")(docs.agg(count(lit(1))).collect())
    val bands = docs.select(col("id"),
      explode(transform(sequence(lit(0), lit(63)),
        b => xxhash64(b, slice(col("sig"), b * 2 + 1, lit(2))))).as("bucket"))
    time("bands count")(bands.count())
    val bucketSizes = bands.groupBy("bucket").agg(count(lit(1)).as("bn"))
    time("bucketSizes")(bucketSizes.count())
    val sized = bands.join(bucketSizes.filter(col("bn") <= 1000), Seq("bucket"))
      .select("id", "bucket")
    time("sized")(sized.count())
    val a = sized.select(col("id").as("a_id"), col("bucket"))
    val b = sized.select(col("id").as("b_id"), col("bucket"))
    val cand0 = a.join(b, Seq("bucket")).filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id")
    time("cand0")(println("  cand0=" + cand0.count()))
    val candidates = cand0.dropDuplicates("a_id", "b_id")
    time("candidates dedup")(println("  candidates=" + candidates.count()))
    (1 to 3).foreach(i =>
      time(s"full op run$i")(graft.operators.Dedup.minhashPairs(docsRaw, "doc_id", "text").count()))
    spark.stop()
  }
}
