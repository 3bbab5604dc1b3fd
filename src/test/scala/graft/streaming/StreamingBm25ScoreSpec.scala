package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._

/** Streaming BM25 serving: the split-query hazard is a REFUSAL, not a
  * silent wrongness — a query id straddling micro-batches (or
  * re-served after a restart) fails loudly naming the ids; whole-query
  * staging streams to the batch answer; the opt-out accepts fragments.
  */
class StreamingBm25ScoreSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(tag: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_sbm25_spec_${tag}_${java.util.UUID.randomUUID}").getAbsolutePath

  private def docs = Tables.documents(spark, sf()).select("doc_id", "text")

  private def fileSource(stage: String) = {
    val schema = spark.read.parquet(stage).schema
    spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(stage)
  }

  test("a query split across micro-batches refuses loudly, naming the id") {
    val idx = tmp("idx")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", idx)
    val base = tmp("split")
    // one query's terms deliberately fragmented into two files = two
    // AvailableNow micro-batches
    Seq((0L, "spark")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    Seq((0L, "window")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
        "query_id", "term", k = 10,
        sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    }
    val msg = e.getCause.getMessage
    assert(msg.contains("split across micro-batches") && msg.contains("0"),
      msg)
  }

  test("restart continuation: a resumed stream refuses a re-served id (seen set seeded from the sink)") {
    val idx = tmp("idx2")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", idx)
    val base = tmp("restart")
    Seq((0L, "spark"), (0L, "window")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
      "query_id", "term", k = 10,
      sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out/batch-*").count() > 0)
    // the stream RESUMES (same checkpoint — the IdempotentSink
    // contract: checkpoint and sink live and die together) after the
    // serving tier wrongly re-emits query 0: the new micro-batch has a
    // fresh batchId (no marker), and the seen set — seeded from the
    // sink, since the first run's driver state is gone — refuses
    Seq((0L, "agg")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
        "query_id", "term", k = 10,
        sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    }
    assert(e.getCause.getMessage.contains("first scored by batch"),
      e.getCause.getMessage)
  }

  test("crash replay converges: a batch that wrote but lost its marker re-runs, overwrites its own directory, and the guard does not refuse it") {
    val idx = tmp("idx4")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", idx)
    val base = tmp("replay")
    Seq((0L, "spark"), (0L, "window")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    Seq((1L, "hash"), (1L, "join")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
      "query_id", "term", k = 5,
      sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    val want = spark.read.parquet(s"$base/out/batch-*")
      .collect().map(_.toSeq).toSet
    // CRASH SNAPSHOT: a batch appended its output but died before its
    // marker AND before the checkpoint commit — previously the guard
    // re-read its own ids from the sink on restart and refused forever
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val markers = fs.listStatus(
        new org.apache.hadoop.fs.Path(s"$base/out/_batches"))
      .map(_.getPath).sortBy(_.getName)
    val lastBatch = markers.last.getName.toLong
    fs.delete(markers.last, false)
    val ckpt = fs.listStatus(new org.apache.hadoop.fs.Path(
        s"$base/ckpt/commits")).map(_.getPath)
      .filter(_.getName == lastBatch.toString)
    ckpt.foreach(p => fs.delete(p, false))
    // restart with the same checkpoint: the source replays the batch
    // (same batchId, same rows), the write overwrites batch-<id>, the
    // marker commits — the sink equals the clean run exactly
    StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
      "query_id", "term", k = 5,
      sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out/batch-*")
      .collect().map(_.toSeq).toSet == want)
    // each query id held exactly once per rank — no duplication
    assert(spark.read.parquet(s"$base/out/batch-*")
      .filter($"rank" === 1).count() == 2)
  }

  test("whole-query staging == batch multi-query; opt-out accepts fragments (documented risk)") {
    val idx = tmp("idx3")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", idx)
    val queries = Seq(
      0L -> "spark", 0L -> "window", 1L -> "hash", 1L -> "join")
    val expected = TextAnalysis.scoreWithBm25IndexMulti(spark, idx,
        queries.toDF("query_id", "term"), "query_id", "term", k = 5)
      .collect().map(_.toSeq).toSet
    val base = tmp("whole")
    for (qid <- queries.map(_._1).distinct)
      queries.filter(_._1 == qid).toDF("query_id", "term")
        .coalesce(1).write.mode("append").parquet(s"$base/stage")
    StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
      "query_id", "term", k = 5,
      sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    assert(spark.read.parquet(s"$base/out/batch-*")
      .collect().map(_.toSeq).toSet == expected)

    // opt-out: the split stages complete (each fragment scored) — the
    // caller accepted per-fragment semantics explicitly
    val base2 = tmp("optout")
    Seq((7L, "spark")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base2/stage")
    Seq((7L, "window")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base2/stage")
    StreamingBm25Score.run(spark, fileSource(s"$base2/stage"), idx,
      "query_id", "term", k = 5,
      sinkPath = s"$base2/out", checkpoint = s"$base2/ckpt",
      refuseSplitQueries = false)
    // two fragments -> two result sets for query 7
    assert(spark.read.parquet(s"$base2/out/batch-*")
      .filter($"rank" === 1).count() == 2)
  }

  test("guard state is manifest-backed: _ids files land per batch, a deleted manifest self-heals from the batch's parquet, and the refusal still fires") {
    val idx = tmp("idx5")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", idx)
    val base = tmp("manifest")
    Seq((0L, "spark"), (0L, "window")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
      "query_id", "term", k = 10,
      sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    val fs = org.apache.hadoop.fs.FileSystem.getLocal(
      spark.sparkContext.hadoopConfiguration)
    val batchDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$base/out"))
      .filter(_.getPath.getName.startsWith("batch-")).map(_.getPath)
    assert(batchDirs.nonEmpty)
    // every committed batch carries its id manifest
    for (d <- batchDirs)
      assert(fs.exists(new org.apache.hadoop.fs.Path(d, "_ids")), d.toString)
    // a sink written before manifests existed (simulated by deleting
    // them) self-heals: the guard derives + persists the manifest from
    // the batch's own parquet, and STILL refuses the re-served id
    for (d <- batchDirs)
      fs.delete(new org.apache.hadoop.fs.Path(d, "_ids"), false)
    Seq((0L, "agg")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
        "query_id", "term", k = 10,
        sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    }
    assert(e.getCause.getMessage.contains("first scored by batch"),
      e.getCause.getMessage)
    for (d <- batchDirs) // re-derived and persisted
      assert(fs.exists(new org.apache.hadoop.fs.Path(d, "_ids")), d.toString)
  }

  test("a pre-batch-directory (flat) sink refuses to resume instead of silently forgetting its served history") {
    val idx = tmp("idx6")
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", idx)
    val base = tmp("flat")
    // a flat sink from the old layout: part files directly in the root
    Seq((0L, 1, 42L, 2, 1.5)).toDF("query_id", "rank", "doc_id", "n_terms", "score")
      .coalesce(1).write.parquet(s"$base/out")
    Seq((1L, "spark")).toDF("query_id", "term")
      .coalesce(1).write.mode("append").parquet(s"$base/stage")
    val e = intercept[IllegalStateException] {
      StreamingBm25Score.run(spark, fileSource(s"$base/stage"), idx,
        "query_id", "term", k = 10,
        sinkPath = s"$base/out", checkpoint = s"$base/ckpt")
    }
    assert(e.getMessage.contains("flat data file"), e.getMessage)
    // opt-out path is not a loophole either — the refusal is about the
    // sink layout, not the guard: with the guard off the stream may
    // proceed (documented), so only assert the guarded path refuses
  }
}
