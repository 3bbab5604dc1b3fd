package graft.tools
import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measures the single-scan-task serialization hypothesis: the sf0.1
  * documents table is ONE parquet file (one row group), so every
  * CPU-heavy text expression pass runs on one core unless spread.
  * Times each pass as scan-direct vs repartition(cores)-first.
  */
object ProfileSpread {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](l: String)(f: => T): Unit = {
      var best = Double.MaxValue
      for (_ <- 1 to 5) {
        val t0 = System.nanoTime(); f
        best = math.min(best, (System.nanoTime()-t0)/1e9)
      }
      println(f"[p] $l%-44s $best%7.3f s")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.count()
    println(s"[p] docs scan partitions = ${docs.queryExecution.toRdd.getNumPartitions}")
    def noop(d: org.apache.spark.sql.DataFrame): Unit =
      d.write.format("noop").mode("overwrite").save()

    val band = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      explode(TextFunctions.minhashBands(col("text"), 3, 64, 2)).as("b"))
    val tc = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      TextFunctions.termCounts(col("text")).as("tc"))
    val sh = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      TextFunctions.shingleHashes(col("text"), 3).as("sh"))
    val spread = docs.repartition(spark.sparkContext.defaultParallelism)

    val bandNoExplode = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      TextFunctions.minhashBands(col("text"), 3, 64, 2).as("b"))
    val band256 = (d: org.apache.spark.sql.DataFrame) => d.select(col("doc_id"),
      TextFunctions.minhashBands(col("text"), 3, 256, 2).as("b"))
    time("xxhash64 baseline pass")(noop(docs.select(xxhash64(col("text")).as("h"))))
    time("bands scan-direct (noop)")(noop(band(docs)))
    time("bands repartition-first (noop)")(noop(band(spread)))
    time("bands noexplode (noop)")(noop(bandNoExplode(docs)))
    time("bands256 noexplode (noop)")(noop(band256(docs)))
    time("termCounts scan-direct")(noop(tc(docs)))
    time("shingleHashes scan-direct")(noop(sh(docs)))
    def bp(d: org.apache.spark.sql.DataFrame) =
      d.select(col("doc_id").as("id"),
          explode(TextFunctions.minhashBands(col("text"), 3, 64, 2)).as("bucket"))
        .groupBy("bucket")
        .agg(graft.functions.BoundedCollect.bounded_long_list(col("id"), 1000).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    time("bucketPairs-shape scan-direct")(noop(bp(docs)))
    time("bucketPairs-shape repartition-first")(noop(bp(spread)))
    time("bucketPairs + localCheckpoint") {
      graft.operators.Materialize(bp(docs)); ()
    }
    time("lc + rdd-count") {
      graft.operators.Materialize.count(
        graft.operators.Materialize(bp(docs))); ()
    }
    spark.stop()
  }
}
