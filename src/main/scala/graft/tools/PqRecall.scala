package graft.tools
import org.apache.spark.sql.functions._
import graft.operators.{Quantization, Similarity}
object PqRecall {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val embs = graft.Tables.embeddings(spark, "/root/testdata/sf0.001").select("vec_id","embedding")
    val queries = embs.filter(col("vec_id") < 5)
    val exact = Similarity.bruteTopK(embs, queries, "vec_id", "embedding", k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    for (k0 <- Seq(10, 30, 50, 100)) {
      val cand = Quantization.pqTopK(embs, queries, "vec_id", "embedding", m=8, ks=16, k=k0)
      val rer = Similarity.rerankCandidates(embs,
        Similarity.prepareQueries(queries, "vec_id", "embedding"), cand, "vec_id", "embedding", k=10)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      println(s"k0=$k0 two-stage recall=" + rer.count(exact).toDouble / exact.size)
    }
    spark.stop()
  }
}
