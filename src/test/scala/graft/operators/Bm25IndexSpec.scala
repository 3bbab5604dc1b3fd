package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Persisted BM25 index: build-once/score-many parity with the
  * inline operators — indexed ≡ inline bit-for-bit via the shared
  * scoring tails, the probe plan never touches the corpus, meta pins
  * tokenization AND the scoring parameters. */
class Bm25IndexSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = graft.Tables.documents(spark, sf())
    .select("doc_id", "text")

  private val terms = Seq("spark", "window", "agg")

  private def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  private def rowsM(df: org.apache.spark.sql.DataFrame) = df.collect()
    .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3),
      r.getDouble(4))).toSet

  test("indexed == inline bit-for-bit (single and multi); probe plan reads only the index") {
    val base = java.nio.file.Files.createTempDirectory("bm25idx").toString
    TextAnalysis.writeBm25Index(corpus, "doc_id", "text", base)

    val indexed = TextAnalysis.scoreWithBm25Index(spark, base, terms, k = 20)
    val inline = TextAnalysis.bm25TopK(corpus, "doc_id", "text", terms, k = 20)
    assert(rows(indexed) == rows(inline)) // every score bit, DECIMAL included

    val queries = PipelineQueriesBm25Fixture.queries.toDF("query_id", "term")
    val indexedM = TextAnalysis.scoreWithBm25IndexMulti(
      spark, base, queries, "query_id", "term", k = 10)
    val inlineM = TextAnalysis.bm25TopKMulti(
      corpus, "doc_id", "text", queries, "query_id", "term", k = 10)
    assert(rowsM(indexedM) == rowsM(inlineM))

    // build-once kept at score time: the probe plan's file scans are
    // ONLY index parquet — postings twice (the term-pruned scoring
    // read and the term-pruned df count) + dl once; the corpus is
    // absent (scan count pinned, every root path under the index)
    // sparkPlan (pre-adaptive): AdaptiveSparkPlanExec hides children
    // from collect
    for ((df, tag) <- Seq((indexed, "single"), (indexedM, "multi"))) {
      val scans = df.queryExecution.sparkPlan.collect {
        case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      }
      assert(scans.size == 3,
        s"$tag: expected 3 index file scans (postings x2, dl), got " +
          s"${scans.size}:\n" +
          scans.map(_.relation.location.rootPaths.mkString(",")).mkString("\n"))
      assert(scans.forall(
          _.relation.location.rootPaths.forall(_.toString.contains(base))),
        s"$tag: probe plan scans a non-index file:\n" +
          scans.map(_.relation.location.rootPaths.mkString(",")).mkString("\n"))
    }
  }

  test("meta pins tokenization and k1/b; degenerate corpus fails the build loudly") {
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("bm25idx2").toString
    TextAnalysis.writeBm25Index(docs, "doc_id", "text", base,
      k1 = 1.6, b = 0.6)
    // the index's scoring config is META's, not the caller's: probes
    // under the pinned (k1, b) equal inline scoring at those values
    val got = TextAnalysis.scoreWithBm25Index(spark, base, Seq("a", "c"), k = 5)
    val want = TextAnalysis.bm25TopK(docs, "doc_id", "text", Seq("a", "c"),
      k = 5, k1 = 1.6, b = 0.6)
    assert(rows(got) == rows(want))

    // corrupt the tokenization pin -> probe must refuse (refresh the
    // session's cached file listing — the overwrite replaced the files
    // the earlier probe's read had indexed)
    Seq((2L, 5L, 1.6, 0.6, "some-other-tokenizer"))
      .toDF("n_docs", "total_len", "k1", "b", "tokenization")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
    spark.catalog.refreshByPath(s"$base/meta")
    val e = intercept[Exception] {
      TextAnalysis.loadBm25Index(spark, base)
    }
    assert(e.getMessage.contains("tokenization"),
      s"${e.getClass.getName}: ${e.getMessage}")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))

    // an all-empty corpus cannot build (n_docs = 0 would divide by 0
    // at score time — refuse at build)
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.writeBm25Index(
        Seq((1L, ""), (2L, "")).toDF("doc_id", "text"), "doc_id", "text",
        java.nio.file.Files.createTempDirectory("bm25idx3").toString)
    }
    assert(e2.getMessage.contains("BM25"), e2.getMessage)
  }

  test("append == rebuild on the union, bit-for-bit; overlap / empty / tokenization discipline") {
    val incr = java.nio.file.Files.createTempDirectory("bm25app").toString
    TextAnalysis.writeBm25Index(corpus.filter($"doc_id" % 4 =!= 0),
      "doc_id", "text", incr)
    TextAnalysis.appendToBm25Index(corpus.filter($"doc_id" % 4 === 0),
      "doc_id", "text", incr)
    val full = java.nio.file.Files.createTempDirectory("bm25full").toString
    TextAnalysis.writeBm25Index(corpus, "doc_id", "text", full)
    // merged == rebuilt: every score bit (integer stat merge is exact)
    assert(rows(TextAnalysis.scoreWithBm25Index(spark, incr, terms, k = 20))
      == rows(TextAnalysis.scoreWithBm25Index(spark, full, terms, k = 20)))
    val queries = PipelineQueriesBm25Fixture.queries.toDF("query_id", "term")
    assert(rowsM(TextAnalysis.scoreWithBm25IndexMulti(
        spark, incr, queries, "query_id", "term", k = 10))
      == rowsM(TextAnalysis.scoreWithBm25IndexMulti(
        spark, full, queries, "query_id", "term", k = 10)))

    // an overlapping doc id would double-count — refused loudly
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.appendToBm25Index(corpus.limit(3), "doc_id", "text", incr)
    }
    assert(e.getMessage.contains("already exist"), e.getMessage)

    // empty increment is a no-op (stats untouched)
    val before = TextAnalysis.loadBm25Index(spark, incr)
    TextAnalysis.appendToBm25Index(corpus.filter($"doc_id" < 0),
      "doc_id", "text", incr)
    val after = TextAnalysis.loadBm25Index(spark, incr)
    assert((after.nDocs, after.totalLen) == (before.nDocs, before.totalLen))

    // tokenization pin guards the append path too (write the fake pin
    // into the LIVE manifest-resolved meta generation)
    val liveMeta = IndexLayout.snapshot(spark, incr).dir("meta")
    Seq((2L, 5L, 1.2, 0.75, "some-other-tokenizer"))
      .toDF("n_docs", "total_len", "k1", "b", "tokenization")
      .coalesce(1).write.mode("overwrite").parquet(liveMeta)
    spark.catalog.refreshByPath(liveMeta)
    val e2 = intercept[Exception] {
      TextAnalysis.appendToBm25Index(
        Seq((900L, "brand new doc")).toDF("doc_id", "text"),
        "doc_id", "text", incr)
    }
    assert(e2.getMessage.contains("tokenization"), e2.getMessage)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(incr))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(full))
  }

  test("streaming serving: stream output == batch multi-scoring; state hoisted (meta deleted after load)") {
    val base = java.nio.file.Files.createTempDirectory("bm25idx4").toString
    TextAnalysis.writeBm25Index(corpus, "doc_id", "text", base)
    val queries = PipelineQueriesBm25Fixture.queries
    val expected = rowsM(TextAnalysis.bm25TopKMulti(corpus, "doc_id", "text",
      queries.toDF("query_id", "term"), "query_id", "term", k = 10))

    // load the state ONCE, then DELETE meta/: the stream runs from the
    // hoisted state alone — the per-batch path never touches meta/
    val state = TextAnalysis.loadBm25Index(spark, base)
    org.apache.commons.io.FileUtils.deleteDirectory(
      new java.io.File(s"$base/meta"))

    val run = java.nio.file.Files.createTempDirectory("bm25run").toString
    for (qid <- queries.map(_._1).distinct) // one file = one whole query
      queries.filter(_._1 == qid).toDF("query_id", "term")
        .coalesce(1).write.mode("append").parquet(s"$run/stage")
    val schema = spark.read.parquet(s"$run/stage").schema
    val src = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$run/stage")
    graft.streaming.StreamingBm25Score.runWithState(state, src,
      "query_id", "term", k = 10, s"$run/out", s"$run/ckpt")
    assert(rowsM(spark.read.parquet(s"$run/out/batch-*")) == expected)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(run))
  }
}

/** The q_bm25_multi fixture batch, shared with the spec without
  * reaching into queries' private state. */
object PipelineQueriesBm25Fixture {
  val queries: Seq[(Long, String)] =
    graft.queries.PipelineQueries.bm25MultiQueries
}
