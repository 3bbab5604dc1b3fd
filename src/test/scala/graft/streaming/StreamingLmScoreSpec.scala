package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Streaming LM scoring: the model is fixed, so the stream's output
  * must equal batch scoring of the same rows for ANY batch
  * boundaries; the driver-side meta loads once at stream start. */
class StreamingLmScoreSpec extends SparkSpec {

  private def tmp(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_slm_spec_${tag}_${java.util.UUID.randomUUID}").getAbsolutePath

  test("stream output == batch scoring at two batchings; meta hoisted (deleted after start)") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val idx = tmp("idx")
    TextAnalysis.writeLmIndex(docs.filter(col("doc_id") % 2 === 1), "text", idx)

    val expected = TextAnalysis
      .scoreWithLmIndex(spark, idx, docs, "doc_id", "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

    // read the meta ONCE, then DELETE it: the second (5-batch) stream
    // runs from the hoisted state alone — proving the per-batch path
    // never touches meta/
    val v = TextAnalysis.readLmMeta(spark, idx)

    for (nFiles <- Seq(2, 5)) {
      val base = tmp(s"run$nFiles")
      docs.repartition(nFiles).write.parquet(s"$base/stage")
      val schema = spark.read.parquet(s"$base/stage").schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/stage")
      if (nFiles == 2)
        StreamingLmScore.run(spark, src, idx, "doc_id", "text",
          s"$base/out", s"$base/ckpt")
      else {
        org.apache.commons.io.FileUtils.deleteDirectory(
          new java.io.File(s"$idx/meta"))
        StreamingLmScore.runWithState(spark, v, src, idx, "doc_id", "text",
          s"$base/out", s"$base/ckpt")
      }
      val got = spark.read.parquet(s"$base/out")
        .collect()
        .map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_trans"),
          r.getAs[Long]("sum_lp_fp"), r.getAs[Double]("cross_entropy_bits"))).toSet
      assert(got == expected, s"batching=$nFiles")
    }
  }
}
