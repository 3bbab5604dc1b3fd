package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Streaming index dedup: because every micro-batch probes the same
  * FIXED index, the stream's output must equal the batch anti-join
  * over the same rows for ANY batch boundaries. */
class StreamingIndexDedupSpec extends SparkSpec {

  private def tmp(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sid_spec_${tag}_${java.util.UUID.randomUUID}").getAbsolutePath

  test("stream output == batch anti-join, at two different batchings") {
    val docs = Tables.documents(spark, sf())
    val idx = tmp("idx")
    Dedup.writeMinhashIndex(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)

    val newDocs = docs.filter(col("doc_id") % 2 === 0)
    val dupIds = Dedup.probeMinhashIndex(
        spark, idx, newDocs, "doc_id", "text", threshold = 0.8)
      .select(col("corpus_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = newDocs.collect().map(_.getAs[Long]("doc_id")).toSet -- dupIds

    for (nFiles <- Seq(2, 5)) {
      val base = tmp(s"run$nFiles")
      newDocs.repartition(nFiles).write.parquet(s"$base/stage")
      val schema = spark.read.parquet(s"$base/stage").schema
      val src = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$base/stage")
      StreamingIndexDedup.run(spark, src, idx, "doc_id", "text", 0.8,
        s"$base/out", s"$base/ckpt")
      val got = spark.read.parquet(s"$base/out")
        .collect().map(_.getAs[Long]("doc_id")).toSet
      assert(got == expected, s"batching=$nFiles")
    }
  }

  test("index state is hoisted: zero meta reads during the stream (meta deleted after load)") {
    val docs = Tables.documents(spark, sf())
    val idx = tmp("idx2")
    Dedup.writeMinhashIndex(
      docs.filter(col("doc_id") % 2 === 1), "doc_id", "text", idx)

    val newDocs = docs.filter(col("doc_id") % 2 === 0)
    // batch truth computed BEFORE the meta deletion
    val dupIds = Dedup.probeMinhashIndex(
        spark, idx, newDocs, "doc_id", "text", threshold = 0.8)
      .select(col("corpus_id")).distinct()
      .collect().map(_.getLong(0)).toSet
    val expected = newDocs.collect().map(_.getAs[Long]("doc_id")).toSet -- dupIds

    // the parameterized probe form equals the self-reading form
    val st = Dedup.loadMinhashIndex(spark, idx)
    val viaState = Dedup.probeMinhashIndexWith(
        st, newDocs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val viaPath = Dedup.probeMinhashIndex(
        spark, idx, newDocs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(viaState == viaPath && viaState.nonEmpty)

    // delete meta/ — a stream that still read it per batch would fail;
    // the hoisted state must carry the whole run (3 micro-batches)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$idx/meta"))
    val base = tmp("runhoist")
    newDocs.repartition(3).write.parquet(s"$base/stage")
    val schema = spark.read.parquet(s"$base/stage").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/stage")
    StreamingIndexDedup.runWithState(st, src, "doc_id", "text", 0.8,
      s"$base/out", s"$base/ckpt")
    val got = spark.read.parquet(s"$base/out")
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(got == expected)
  }
}
