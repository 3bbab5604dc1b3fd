package graft.tools

import graft.Tables
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc profiler: clusters pipeline breakdown at the bench SF. */
object ProfileClusters {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
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

    val docs = Tables.documents(spark, sfDir)
    time("docs count")(docs.count())
    (1 to 3).foreach { i =>
      val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8)
      time(s"minhashPairs run$i")(println("  pairs=" + pairs.count()))
    }
    (1 to 3).foreach { i =>
      val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8)
      val cc = time(s"clustersFromPairs run$i") {
        graft.operators.Dedup.clustersFromPairs(docs, "doc_id", pairs).count()
      }
      println("  cc rows=" + cc)
    }
    (1 to 3).foreach { i =>
      time(s"full clusters run$i")(
        graft.queries.PipelineQueries.dedupClusters(spark, sfDir).count())
    }
    // post-pollution: does session state accumulated above slow a
    // previously-fast query down (bench-order effect)?
    (1 to 3).foreach { i =>
      time(s"minhash query late run$i")(
        graft.queries.PipelineQueries.dedupMinhash(spark, sfDir).count())
    }
    // construction (eager Materialize jobs) vs execution split
    (1 to 3).foreach { i =>
      val p = time(s"construct minhashPairs run$i")(
        graft.operators.Dedup.minhashPairs(docs, "doc_id", "text", threshold = 0.8))
      time(s"  count after construct run$i")(p.count())
      time(s"  orderBy count run$i")(p.orderBy("a_id", "b_id").count())
    }
    // banding alone (the corpus-wide pass; fused MinHashBands)
    import graft.functions.TextFunctions
    (1 to 2).foreach { i =>
      val bands = docs.select(col("doc_id").as("id"),
        explode(TextFunctions.minhashBands(col("text"), 3, 64, 2)).as("bucket"))
      time(s"bands.count run$i")(bands.count())
    }
    println("[prof] storage " + spark.sparkContext.getRDDStorageInfo.length + " rdds, " +
      spark.sparkContext.getRDDStorageInfo.map(_.memSize).sum / 1024 / 1024 + " MiB cached")
    spark.stop()
  }
}
