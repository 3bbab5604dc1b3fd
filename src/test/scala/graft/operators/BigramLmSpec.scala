package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bigram-LM cross-entropy: the fixed-point log2 must be exact,
  * monotone, and engine-templatable; the operator must reproduce the
  * hand-computed add-one model on a tiny corpus, including unseen
  * contexts and the ref-doc-scores-itself case. */
class BigramLmSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  // Scala reference for lg2fp: il*2^20 + floor(x*2^20 / 2^il) - 2^20
  private def lgRef(x: Long): Long = {
    require(x >= 1)
    val il = 63 - java.lang.Long.numberOfLeadingZeros(x)
    val frac =
      if (il >= 20) x >> (il - 20)
      else x << (20 - il)
    il.toLong * 1048576L + frac - 1048576L
  }

  test("lg2fp: exact at powers of two, monotone, matches the reference") {
    val xs = (0 to 62).map(1L << _) ++
      Seq(3L, 5L, 7L, 100L, 999L, 1048575L, 1048577L,
        123456789L, 987654321987L, Long.MaxValue)
    val got = xs.toDF("x")
      .selectExpr("x", TextAnalysis.lg2fpSql("x", spark = true) + " AS lg")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (x <- xs) assert(got(x) == lgRef(x), s"x=$x")
    // powers of two are exact: lg2fp(2^k) = k * 2^20
    for (k <- 0 to 62) assert(got(1L << k) == k.toLong * 1048576L)
    // strict monotonicity over the sorted distinct sample
    val sorted = xs.distinct.sorted
    for (Seq(a, b) <- sorted.sliding(2)) assert(got(a) < got(b), s"$a,$b")
  }

  test("cross-entropy: hand-computed add-one model, unseen contexts") {
    // ref = doc 1 only: "a b a" -> transitions (a b), (b a)
    //   model: c12(a b)=1, c12(b a)=1; c1: a=1, b=1; V=2
    val docs = Seq(
      (1L, "a b a"),   // (a b): (1+1)/(1+2), (b a): same -> lp each lg(3)-lg(2)
      (2L, "a b c"),   // (a b): 2/3; (b c): unseen bigram, seen ctx -> 1/3
      (3L, "z q z"),   // both transitions: unseen ctx -> 1/V = 1/2
      (4L, "solo")     // < 2 words: no transitions, absent from output
    ).toDF("doc_id", "text")
    val out = TextAnalysis.bigramCrossEntropy(
        docs.filter($"doc_id" === 1), docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    val lg2 = lgRef(2); val lg3 = lgRef(3)
    assert(lg2 == 1048576L && lg3 == 1572864L) // pin the fixture arithmetic
    assert(out(1L) == ((2L, 2 * (lg3 - lg2), (2.0 * (lg3 - lg2)) / (2 * 1048576))))
    assert(out(2L) == ((2L, (lg3 - lg2) + lg3, ((lg3 - lg2) + lg3.toDouble) / (2 * 1048576))))
    assert(out(3L) == ((2L, 2 * lg2, 1.0)))
    assert(!out.contains(4L))
  }

  test("hash-keyed scores equal string-keyed scores on the fixture corpus") {
    val docs = graft.Tables.documents(spark, sf()).select("doc_id", "text")
    val ref = docs.filter($"doc_id" % 2 === 1)
    val hashed = TextAnalysis.bigramCrossEntropy(ref, docs, "doc_id", "text")
      .select("doc_id", "n_trans", "sum_lp_fp")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // string-keyed replay of the same model (the mirror's semantics)
    def tr(src: org.apache.spark.sql.DataFrame) = src
      .select(col("doc_id"), split(col("text"), " ", -1).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> struct(toks[i] AS w1, concat(toks[i], ' ', toks[i+1]) AS bg))")).as("t"))
      .select(col("doc_id"), col("t.w1").as("w1"), col("t.bg").as("bg"))
    val m = tr(ref).groupBy("bg").agg(
      first(col("w1")).as("w1"), count(lit(1)).as("c12"))
    val c1 = m.groupBy("w1").agg(sum("c12").as("c1"))
    val v = c1.count()
    val strKeyed = tr(docs)
      .join(m.select("bg", "c12"), Seq("bg"), "left")
      .join(c1, Seq("w1"), "left")
      .withColumn("num", coalesce(col("c12"), lit(0L)) + lit(1L))
      .withColumn("den", coalesce(col("c1"), lit(0L)) + lit(v))
      .withColumn("lp", expr(
        s"${TextAnalysis.lg2fpSql("den", spark = true)} - " +
          s"${TextAnalysis.lg2fpSql("num", spark = true)}"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_trans"), sum("lp").as("sum_lp_fp"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(hashed == strKeyed)
  }

  test("persisted LM index: indexed scores ≡ inline scores, reference absent from the scoring plan") {
    val docs = graft.Tables.documents(spark, sf()).select("doc_id", "text")
    val ref = docs.filter($"doc_id" % 2 === 1)
    val base = java.nio.file.Files.createTempDirectory("lmidx").toString
    TextAnalysis.writeLmIndex(ref, "text", base)

    val indexed = TextAnalysis.scoreWithLmIndex(spark, base, docs, "doc_id", "text")
    val inline = TextAnalysis.bigramCrossEntropy(ref, docs, "doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(rows(indexed) == rows(inline)) // bit-for-bit, double included

    // build-once kept at score time: the scoring plan reads model/ctx
    // parquet + the scored corpus — NO fourth relation re-deriving the
    // model from the reference (leaf count on the optimized logical
    // plan; the executed-plan string double-prints under AQE)
    val plan = indexed.queryExecution.executedPlan.toString
    assert(plan.contains(base), s"plan does not read the index:\n$plan")
    val leaves = indexed.queryExecution.optimizedPlan.collectLeaves()
    assert(leaves.size == 4, // docs + model + ctx + the 1-row v relation
      s"expected 4 leaves (docs, model, ctx, v), got ${leaves.size}:\n$plan")

    // meta is a bounded driver read, hoistable for streaming: scoring
    // with pre-read state works with meta/ DELETED from disk
    val v = TextAnalysis.readLmMeta(spark, base)
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(s"$base/meta"))
    val stateScored = TextAnalysis.scoreWithLmState(spark, base, v, docs, "doc_id", "text")
    assert(rows(stateScored) == rows(inline))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
  }

  test("LM index meta pins tokenization; degenerate reference fails the build loudly") {
    val docs = Seq((1L, "a b c"), (2L, "a b")).toDF("doc_id", "text")
    val base = java.nio.file.Files.createTempDirectory("lmidx2").toString
    TextAnalysis.writeLmIndex(docs, "text", base)
    // corrupt the tokenization pin -> probe must refuse
    val s2h = spark
    import s2h.implicits._
    Seq((3L, "some-other-tokenizer")).toDF("v", "tokenization")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/meta")
    val e = intercept[IllegalArgumentException] {
      TextAnalysis.readLmMeta(spark, base)
    }
    assert(e.getMessage.contains("tokenization"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))

    // all-short reference: zero transitions -> loud build failure
    val short = Seq((1L, "solo"), (2L, "x")).toDF("doc_id", "text")
    val base2 = java.nio.file.Files.createTempDirectory("lmidx3").toString
    val e2 = intercept[IllegalArgumentException] {
      TextAnalysis.writeLmIndex(short, "text", base2)
    }
    assert(e2.getMessage.contains("V = 0"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base2))
  }

  test("one reference scan: the model is materialized for its consumers") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select("doc_id", "text")
    val plan = TextAnalysis.bigramCrossEntropy(
        docs.filter($"doc_id" % 2 === 1), docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    // the reference was scanned ONCE inside Materialize at construction;
    // c1 and V derive from the checkpointed model, so the remaining plan
    // holds exactly the scored-side corpus scan
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 1, s"expected only the scored-side scan, got $scans:\n$plan")
  }
}
