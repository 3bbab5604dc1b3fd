package graft.tools
import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileMh {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/repo/localdata/sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    def time[T](l: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[p] $l%-34s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warm docs")(docs.count())
    for (round <- 1 to 2) {
      val bands = docs.select(col("doc_id").as("id"),
        explode(TextFunctions.minhashBands(col("text"), 3, 64, 2)).as("bucket"))
      val grouped = bands.groupBy("bucket")
        .agg(graft.functions.BoundedCollect.bounded_long_list(col("id"), 1000).as("ids"))
        .filter(col("ids").isNotNull && size(col("ids")) >= 2)
      time(s"r$round grouped count")(grouped.count())
      val pairs = grouped.select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> struct(x AS a_id, y AS b_id))))""".stripMargin)).as("p"))
        .select(col("p.a_id"), col("p.b_id")).dropDuplicates("a_id","b_id")
      time(s"r$round pairs count (no mat)")(pairs.count())
      val mat = time(s"r$round Materialize(pairs)")(graft.operators.Materialize(pairs))
      time(s"r$round mat count")(mat.count())
      val candIds = mat.select(col("a_id").as("id")).union(mat.select(col("b_id").as("id"))).distinct()
      val shingleSets = time(s"r$round Materialize(shingles)")(graft.operators.Materialize(
        docs.join(broadcast(candIds), col("doc_id") === candIds("id"), "left_semi")
          .select(col("doc_id").as("id"), TextFunctions.wordShingles(col("text"), 3).as("sh"))))
      time(s"r$round verify")(mat
        .join(shingleSets.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
        .join(shingleSets.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
        .withColumn("j", size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))))
        .filter(col("j") >= 0.8).count())
    }
    spark.stop()
  }
}
