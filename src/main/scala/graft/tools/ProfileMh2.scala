package graft.tools
import graft.Tables
import graft.functions.TextFunctions
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object ProfileMh2 {
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
      println(f"[p] $l%-36s ${(System.nanoTime()-t0)/1e9}%7.2f s"); r
    }
    val docs = Tables.documents(spark, sfDir)
    time("warm docs")(docs.count())
    val pairs = graft.operators.Dedup.minhashPairs(docs, "doc_id", "text")
    // mimic internals
    val bands = docs.select(col("doc_id").as("id"),
      explode(TextFunctions.minhashBands(col("text"), 3, 64, 2)).as("bucket"))
    val grouped = bands.groupBy("bucket")
      .agg(graft.functions.BoundedCollect.bounded_long_list(col("id"), 1000).as("ids"))
      .filter(col("ids").isNotNull && size(col("ids")) >= 2)
    val cand = grouped.select(explode(expr(
      """flatten(transform(ids, (x, i) ->
        |  transform(slice(ids, i + 2, size(ids) - i - 1),
        |            y -> struct(x AS a_id, y AS b_id))))""".stripMargin)).as("p"))
      .select(col("p.a_id"), col("p.b_id")).dropDuplicates("a_id","b_id")
    val mat = time("Materialize(pairs)")(graft.operators.Materialize(cand))
    val candIds = mat.select(col("a_id").as("id")).union(mat.select(col("b_id").as("id"))).distinct()
    time("candIds count")(println("  n=" + candIds.count()))
    val semi = docs.join(broadcast(candIds), col("doc_id") === candIds("id"), "left_semi")
    time("semi count")(println("  n=" + semi.count()))
    val sh = semi.select(col("doc_id").as("id"), TextFunctions.wordShingles(col("text"), 3).as("sh"))
    time("shingles count (no ckpt)")(sh.count())
    time("shingles collect size")(println("  rows=" + sh.collect().length))
    val lc = time("localCheckpoint(eager)")(sh.localCheckpoint(true))
    time("lc count")(lc.count())
    println("  sh partitions=" + sh.rdd.getNumPartitions)
    spark.stop()
  }
}
