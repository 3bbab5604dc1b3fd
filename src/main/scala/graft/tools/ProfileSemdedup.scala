package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase breakdown of q_semdedup's sf0.1 floor (VERDICT r8 item #6):
  * times each driver ACTION in `Similarity.semanticDedup`'s pipeline
  * separately — corpus count (autoCells), centroid collect,
  * assignment Materialize write, hot-cell census, and the final
  * keep-join query — to name which one owns the post-r6 floor. */
object ProfileSemdedup {
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
    spark.read.parquet(s"$sfDir/embeddings.parquet").count()

    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[semdedup] $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    for (rep <- 1 to 3) {
      println(s"-- rep $rep --")
      val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      val planted = base.filter(col("vec_id") < 100)
        .select((col("vec_id") + 1000000L).as("vec_id"),
          transform(col("embedding"),
            (x, i) => x + pmod(i, lit(7)).cast("float") * lit(0.001f)).as("embedding"))
      val corpus = base.unionByName(planted)
      val c = corpus.select(col("vec_id").as("n_id"),
        graft.operators.Similarity.asDouble(col("embedding")).as("n_v"))
      time("full q_semdedup")(
        graft.queries.PipelineQueries.semdedup(spark, sfDir).count())
      time("corpus count (skipped: cells=16 pinned)")(())
      val cents = time("centroids collect")(
        graft.operators.Similarity.collectCentroids(
          graft.operators.Similarity.defaultCentroids(c, 16)))
      val assigned = time("assignment Materialize")(
        graft.operators.Materialize(
          graft.operators.Similarity.assignToCells(c, cents)))
      time("hot-cell census")(
        assigned.groupBy("cell").count().filter(col("count") > 65536L).collect())
      time("remaining keep-join query") {
        // the pair join + keep join over the already-materialized table
        val a = assigned.select(col("cell"), col("n_id").as("a_id"), col("n_v").as("a_v"))
        val b = assigned.select(col("cell"), col("n_id").as("b_id"), col("n_v").as("b_v"))
        a.join(b, Seq("cell")).filter(col("a_id") < col("b_id")).count()
      }
    }
    spark.stop()
  }
}
