package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Replay-safety of the shared foreachBatch sink: re-running a
  * COMMITTED batch (same batchId) must leave the sink holding each
  * row exactly once — the failure mode is a crash between the
  * parquet append and the checkpoint commit, which replays the batch
  * on restart. */
class IdempotentSinkSpec extends SparkSpec {

  private def tmp(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_idem_spec_${tag}_${java.util.UUID.randomUUID}").getAbsolutePath

  test("appendOnce: a replayed batchId is a no-op; a new batchId appends") {
    import spark.implicits._
    val sink = tmp("sink")
    val batch = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "s")

    IdempotentSink.appendOnce(batch, sink, batchId = 0L)
    IdempotentSink.appendOnce(batch, sink, batchId = 0L) // crash-replay
    assert(spark.read.parquet(sink).count() == 3,
      "replayed batch duplicated rows in the sink")

    IdempotentSink.appendOnce(batch, sink, batchId = 1L)
    assert(spark.read.parquet(sink).count() == 6)
    // the marker dir is underscore-hidden: sink readers never see it
    assert(spark.read.parquet(sink).columns.toSeq == Seq("id", "s"))
  }

  test("StreamingLmScore sink survives a replayed committed batch unchanged") {
    val docs = Tables.documents(spark, sf()).select("doc_id", "text")
    val idx = tmp("idx")
    TextAnalysis.writeLmIndex(docs.filter(col("doc_id") % 2 === 1), "text", idx)

    val base = tmp("run")
    docs.repartition(3).write.parquet(s"$base/stage")
    val schema = spark.read.parquet(s"$base/stage").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$base/stage")
    StreamingLmScore.run(spark, src, idx, "doc_id", "text",
      s"$base/out", s"$base/ckpt")

    val committed = spark.read.parquet(s"$base/out").count()
    assert(committed == docs.count())
    // simulate the crash-replay of an already-committed micro-batch:
    // foreachBatch re-presents the same rows under the same batchId
    val replayRows = TextAnalysis.scoreWithLmIndex(
      spark, idx, docs.limit(5), "doc_id", "text")
    IdempotentSink.appendOnce(replayRows, s"$base/out", batchId = 0L)
    assert(spark.read.parquet(s"$base/out").count() == committed,
      "replay of a committed batch duplicated sink rows")
  }
}
