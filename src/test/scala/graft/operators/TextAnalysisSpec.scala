package graft.operators

import graft.SparkSpec

class TextAnalysisSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("redact replaces emails, phones, and URLs with typed placeholders") {
    val df = Seq(
      (1L, "contact bob.smith+x@example.co.uk or call +1-555-123-4567 now"),
      (2L, "see https://example.com/path?q=1 for details"),
      (3L, "nothing sensitive here")
    ).toDF("doc_id", "text")
    val out = TextAnalysis.redact(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "contact <EMAIL> or call <PHONE> now")
    assert(out(1) == "see <URL> for details")
    assert(out(2) == "nothing sensitive here")
  }

  test("repetition: hand-computed Gopher stats, edges, tie-break") {
    // "a b a b a b": 2-grams = {a b:3, b a:2} → top "a b" covers
    // 3×3=9 of 11 chars; 3-grams = {a b a:2, b a b:2} → dup covers
    // (2+2)×5=20/11 (> 1: Gopher counts overlap, no coverage dedup)
    val df = Seq(
      (1L, "a b a b a b"),
      (2L, "x"),          // < n tokens → ('', 0, 0)
      (3L, ""),           // empty text → ('', 0, 0)
      (4L, "c c d d")     // tie: "c c","c d","d d" all cnt=1 → smallest gram
    ).toDF("doc_id", "text")
    val m = TextAnalysis.repetition(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(m(1L) == (("a b", 9.0 / 11, 20.0 / 11)))
    assert(m(2L) == (("", 0.0, 0.0)))
    assert(m(3L) == (("", 0.0, 0.0)))
    assert(m(4L)._1 == "c c" && m(4L)._2 == 3.0 / 7 && m(4L)._3 == 0.0)
  }

  test("qualityFilter drops repetitive / stopword-free / short docs") {
    val good = "the quick brown fox jumps over a lazy dog and then the " +
      "fox runs far away into the hills before any dog can follow it"
    val df = Seq(
      (1L, good),
      (2L, Seq.fill(30)("spam").mkString(" ")),          // top_gram_frac ≈ 1
      (3L, "too short"),                                 // n_words < 20
      (4L, Seq.fill(15)("alpha beta").mkString(" "))     // no stopwords
    ).toDF("doc_id", "text")
    val kept = TextAnalysis.qualityFilter(df, "doc_id", "text",
      minWords = 20, maxWords = 1000, minStopRatio = 0.02,
      maxTopGramFrac = 0.20, maxDupGramFrac = 0.55)
      .collect().map(_.getLong(0)).toSet
    assert(kept == Set(1L), s"got $kept")
  }

  test("normalizeForDedup: lowercase, digit-fold, accent-strip, whitespace collapse") {
    val df = Seq(
      (1L, "Café  NAÏVE\tÅngström 42"),
      (2L, "  plain ascii 7 words  "),
      (3L, ""),
      (4L, "ümlaut Über straße")   // ß has no combining mark — must survive
    ).toDF("doc_id", "text")
    val out = TextAnalysis.normalizeForDedup(df, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getString(1))
    assert(out(0) == "cafe naive angstrom 00")
    assert(out(1) == "plain ascii 0 words")
    assert(out(2) == "")
    assert(out(3) == "umlaut uber straße")
    // codegen == interpreted for the accent expression
    import graft.functions.StripAccents
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.unsafe.types.UTF8String
    for (t <- Seq("café", "ascii", "", "ñandú ÈÉÊË x̂"))
      assert(StripAccents(Literal(t)).eval(InternalRow.empty) ==
        UTF8String.fromString(java.text.Normalizer.normalize(t, java.text.Normalizer.Form.NFD)
          .replaceAll("\\p{M}+", "")))
    // two trivially-variant docs normalize identically (the dedup point)
    val variants = Seq((1L, "The Price is 42 Euros"), (2L, "the   price is 17 euros"))
      .toDF("doc_id", "text")
    val norm = TextAnalysis.normalizeForDedup(variants, "doc_id", "text")
      .collect().map(_.getString(1)).distinct
    assert(norm.length == 1)
  }

  test("lineDedup drops corpus-hot lines, preserves order, keeps empty docs") {
    val df = Seq(
      (1L, "a\nb\nc"),
      (2L, "b\nd"),
      (3L, "b\ne\na"),
      (4L, "a\nb"),      // fully boilerplate → empty, not vanished
      (5L, "z\na\ny")    // order preserved around a dropped middle line
    ).toDF("doc_id", "text")
    // counts: a=3, b=4 (hot at k=1); c,d,e,y,z unique
    val out = TextAnalysis.lineDedup(df, "doc_id", "text", maxOccurrences = 1L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(
      (1L, "c", 1L, 2L),
      (2L, "d", 1L, 1L),
      (3L, "e", 1L, 2L),
      (4L, "", 0L, 2L),
      (5L, "z\ny", 2L, 1L)))
    // raising the threshold keeps everything
    val all = TextAnalysis.lineDedup(df, "doc_id", "text", maxOccurrences = 10L)
      .collect()
    assert(all.forall(_.getLong(3) == 0L))
  }

  test("RepetitionStats codegen path is equivalent to interpreted eval") {
    import graft.functions.{RepetitionStats, TextFunctions}
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.functions.col
    // it must be REAL codegen — the quality-filter path runs this over
    // the whole corpus and must stay inside WholeStageCodegen
    assert(!RepetitionStats(Literal("x"), 2, 3).isInstanceOf[CodegenFallback])
    val texts = Seq(
      "a b a b a b", "", "x", "c c d d",
      "😀 y 😀 y 😀 y",   // astral-plane codepoints
      Seq.fill(40)("the quick brown fox").mkString(" "))
    val viaCodegen = texts.toDF("text")
      .select(TextFunctions.repetitionStats(col("text"), 2, 3).as("r"))
      .collect().map { row =>
        val s = row.getStruct(0)
        (s.getString(0), s.getDouble(1), s.getDouble(2))
      }.toSeq
    val viaInterp = texts.map { t =>
      val r = RepetitionStats(Literal(t), 2, 3).eval(InternalRow.empty)
        .asInstanceOf[InternalRow]
      (r.getUTF8String(0).toString, r.getDouble(1), r.getDouble(2))
    }
    assert(viaCodegen == viaInterp)
  }

  test("repetition and qualityFilter plan with zero exchanges") {
    // both are claimed pure map stages over the corpus scan — pin it:
    // any groupBy/explode-based reformulation would show an Exchange
    val df = Seq((1L, "the quick brown fox and the lazy dog")).toDF("doc_id", "text")
    for (q <- Seq(
        TextAnalysis.repetition(df, "doc_id", "text"),
        TextAnalysis.qualityFilter(df, "doc_id", "text"))) {
      val exchanges = q.queryExecution.executedPlan.collect {
        case e: org.apache.spark.sql.execution.exchange.Exchange => e }
      assert(exchanges.isEmpty,
        s"must be a pure map stage:\n${q.queryExecution.executedPlan}")
    }
  }

  test("contamination flags corpus docs sharing fingerprints with probes") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again today"),
      (2L, "an entirely different document about distributed query engines"),
      (3L, "the quick brown fox jumps over the lazy dog again and again tomorrow")
    ).toDF("doc_id", "text")
    // probe = a benchmark item overlapping docs 1 and 3, not 2
    val probes = Seq(
      (100L, "the quick brown fox jumps over the lazy dog again and again")
    ).toDF("probe_id", "text")
    val hits = TextAnalysis.contamination(
      corpus, "doc_id", "text", probes, "probe_id", "text", minMatches = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(hits.contains((1L, 100L)) && hits.contains((3L, 100L)))
    assert(!hits.exists(_._1 == 2L), "unrelated doc must not be flagged")
  }

  test("tfidfTopTerms matches an in-memory reference of the same scoring") {
    val docs = Seq(
      (1L, "apple banana apple cherry"),
      (2L, "banana banana date"),
      (3L, "apple elderberry  elderberry"), // double space → empty token dropped
      (4L, "date cherry date date")
    )
    // reference: tf per (doc, term), df per term, score = tf*1e9/df
    val tf = docs.flatMap { case (id, t) =>
      t.split(" ").filter(_.nonEmpty).groupBy(identity)
        .map { case (w, g) => (id, w, g.length.toLong) }
    }
    val dfm = tf.groupBy(_._2).view.mapValues(_.map(_._1).distinct.size.toLong).toMap
    val ref = tf.map { case (id, w, f) =>
      (id, w, f, dfm(w), f * 1000000000L / dfm(w))
    }.groupBy(_._1).view.mapValues(
      _.sortBy { case (_, w, _, _, s) => (-s, w) }.take(2)
        .zipWithIndex.map { case ((id, w, f, d, s), i) => (w, f, d, s, i + 1) }
    ).toMap
    val got = TextAnalysis.tfidfTopTerms(docs.toDF("doc_id", "text"),
        "doc_id", "text", k = 2)
      .orderBy("doc_id", "rank").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(r =>
        (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getInt(5))).toSeq)
      .toMap
    assert(got == ref, s"got $got\nref $ref")
  }

  test("tfidfTopTerms scans the corpus once and heaps top-k") {
    val df = graft.Tables.documents(spark, sf())
    val q = TextAnalysis.tfidfTopTerms(df, "doc_id", "text", k = 3)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"plan lacks WindowGroupLimit:\n$plan")
    // tf is materialized before its two consumers (df agg + join):
    // without that, each re-derives it from a full corpus re-scan
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0, // materialized tf truncates lineage: no corpus scan in final plan
      s"expected the corpus scan to happen once inside Materialize, got $scans:\n$plan")
  }

  test("cooccurrence: vocab cut, doc-level pair counts, exact lift") {
    val s2b = spark
    import s2b.implicits._
    val df = Seq(
      (1L, "a b c"), (2L, "a b"), (3L, "a c"), (4L, "b c"), (5L, "a b c d")
    ).toDF("doc_id", "text")
    // d (df=1) falls outside the top-3 vocabulary {a, b, c}
    val out = TextAnalysis.cooccurrence(df, "doc_id", "text",
      vocabSize = 3, minPairDocs = 2, topK = 10).collect()
    assert(out.map(r => (r.getString(0), r.getString(1))).toSeq ==
      Seq(("a", "b"), ("a", "c"), ("b", "c")))
    out.foreach { r =>
      assert(r.getAs[Long]("n_ab") == 3L)
      assert(r.getAs[Long]("n_a") == 4L && r.getAs[Long]("n_b") == 4L)
      assert(r.getAs[Double]("lift") == (3.0 / 4) * (5.0 / 4))
    }
    // repeated terms in one doc count the DOC once, not each hit
    val rep = Seq((1L, "x x y"), (2L, "x y"), (3L, "y z")).toDF("doc_id", "text")
    val o2 = TextAnalysis.cooccurrence(rep, "doc_id", "text",
      vocabSize = 3, minPairDocs = 1, topK = 10).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n_ab")).toMap
    assert(o2(("x", "y")) == 2L)
  }

  test("bm25TopK: exact scores on a hand-checked fixture, ranked") {
    val s2d = spark
    import s2d.implicits._
    val df = Seq(
      (1L, "spark spark window x"), // tf(spark)=2, tf(window)=1, dl=4
      (2L, "spark y z w"),          // tf(spark)=1, dl=4
      (3L, "window window a b c d") // tf(window)=2, dl=6
    ).toDF("doc_id", "text")
    // df(spark)=2, df(window)=2; total_len=14, n_docs=3
    val out = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("spark", "window"), k = 3).collect()
    def contrib(tf: Long, dl: Long, dfreq: Long): Double =
      (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 *
        (dl.toDouble * 3 / 14))) * (1000000000L / dfreq).toDouble
    def dsum(xs: Double*): Double =
      xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val expect = Map(
      1L -> dsum(contrib(2, 4, 2), contrib(1, 4, 2)),
      2L -> dsum(contrib(1, 4, 2)),
      3L -> dsum(contrib(2, 6, 2)))
    assert(out.map(_.getAs[Long]("doc_id")).toSeq ==
      expect.toSeq.sortBy { case (d, s) => (-s, d) }.map(_._1))
    out.foreach { r =>
      assert(r.getAs[Double]("score") == expect(r.getAs[Long]("doc_id")),
        s"doc ${r.getAs[Long]("doc_id")}")
    }
    assert(out.find(_.getAs[Long]("doc_id") == 1L).get.getAs[Long]("n_terms") == 2L)
  }

  test("bm25TopK: postings materialized once — no corpus re-scan in the plan") {
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = TextAnalysis.bm25TopK(df, "doc_id", "text", Seq("spark"), k = 5)
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0, s"expected zero corpus scans after Materialize, got $scans")
  }

  test("bm25TopKMulti: per-query rows equal bm25TopK's for the same query") {
    val s2e = spark
    import s2e.implicits._
    val df = spark.read.parquet(s"${sf("0.01")}/documents.parquet")
    val queries = Seq(0L -> "spark", 0L -> "window", 0L -> "agg",
      1L -> "hash", 1L -> "join").toDF("query_id", "term")
    val multi = TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
        queries, "query_id", "term", k = 10)
      .collect()
      .groupBy(_.getAs[Long]("query_id")).view.mapValues(_.map(r =>
        (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_terms"), r.getAs[Double]("score"))).toSet).toMap
    def single(terms: Seq[String]) =
      TextAnalysis.bm25TopK(df, "doc_id", "text", terms, k = 10)
        .collect().map(r => (r.getAs[Int]("rank"), r.getAs[Long]("doc_id"),
          r.getAs[Long]("n_terms"), r.getAs[Double]("score"))).toSet
    assert(multi(0L) == single(Seq("spark", "window", "agg")))
    assert(multi(1L) == single(Seq("hash", "join")))
  }

  test("bm25TopKMulti: duplicate (query, term) rows collapse; exact fixture scores") {
    val s2f = spark
    import s2f.implicits._
    val df = Seq(
      (1L, "spark spark window x"), // tf(spark)=2, tf(window)=1, dl=4
      (2L, "spark y z w"),          // tf(spark)=1, dl=4
      (3L, "window window a b c d") // tf(window)=2, dl=6
    ).toDF("doc_id", "text")
    val queries = Seq(7L -> "spark", 7L -> "spark", 7L -> "window",
      8L -> "window").toDF("query_id", "term")
    val out = TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
      queries, "query_id", "term", k = 3).collect()
    def contrib(tf: Long, dl: Long, dfreq: Long): Double =
      (tf.toDouble * 2.2) / (tf.toDouble + 1.2 * (0.25 + 0.75 *
        (dl.toDouble * 3 / 14))) * (1000000000L / dfreq).toDouble
    def dsum(xs: Double*): Double =
      xs.map(BigDecimal(_).setScale(6, BigDecimal.RoundingMode.HALF_UP))
        .sum.toDouble
    val got = out.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"))
      -> r.getAs[Double]("score")).toMap
    // query 7: duplicate 'spark' row contributes ONCE (as in bm25TopK)
    assert(got((7L, 1L)) == dsum(contrib(2, 4, 2), contrib(1, 4, 2)))
    assert(got((7L, 2L)) == dsum(contrib(1, 4, 2)))
    assert(got((7L, 3L)) == dsum(contrib(2, 6, 2)))
    assert(got((8L, 1L)) == dsum(contrib(1, 4, 2)))
    assert(got((8L, 3L)) == dsum(contrib(2, 6, 2)))
    assert(!got.contains((8L, 2L))) // doc 2 has no 'window'
  }

  test("bm25 maxDf hot-term guard: over-df terms cut before fan-out; default exact") {
    val s2h = spark
    import s2h.implicits._
    val df = Seq(
      (1L, "the spark engine the"), // "the" in every doc (df=3)
      (2L, "the fast spark"),
      (3L, "the slow flink")
    ).toDF("doc_id", "text")
    def rows(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet
    // cutting df > 2 removes "the" entirely: result == querying without it
    val guarded = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("the", "spark"), k = 3, maxDf = 2L)
    val withoutHot = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("spark"), k = 3)
    assert(rows(guarded) == rows(withoutHot) && rows(guarded).nonEmpty)
    // default keeps classic BM25: "the" contributes for every doc
    val full = TextAnalysis.bm25TopK(df, "doc_id", "text",
      Seq("the", "spark"), k = 3)
    assert(full.collect().length == 3)
    assert(full.collect().forall(_.getAs[Long]("n_terms") >= 1))
    // multi form: the same cut applies per query
    val queries = Seq(0L -> "the", 0L -> "spark", 1L -> "the")
      .toDF("query_id", "term")
    val multi = TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
      queries, "query_id", "term", k = 3, maxDf = 2L).collect()
    // query 1 was only the hot term -> no results at all after the cut
    assert(!multi.exists(_.getAs[Long]("query_id") == 1L))
    assert(multi.filter(_.getAs[Long]("query_id") == 0L)
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Double]("score"))).toSet ==
      rows(withoutHot))
  }

  test("bm25RecommendedMaxDf: idf≈0 threshold cuts only over-half terms; non-hot rankings invariant") {
    val s2h = spark
    import s2h.implicits._
    // 4 docs: "the" df=4 (hot, > 4/2), "data" df=2 (= n/2, KEPT),
    // "spark"/"flink" df=1 (selective)
    val df = Seq(
      (1L, "the spark data engine"),
      (2L, "the fast data pipeline"),
      (3L, "the slow flink job"),
      (4L, "the other corpus doc")
    ).toDF("doc_id", "text")
    assert(TextAnalysis.bm25RecommendedMaxDf(4L) == 2L)
    assert(TextAnalysis.bm25RecommendedMaxDf(1L) == 1L) // floor at 1
    val queries = Seq(
      0L -> "spark", 0L -> "data",            // no hot term
      1L -> "the", 1L -> "flink", 1L -> "data" // hot term present
    ).toDF("query_id", "term")
    def byQuery(d: org.apache.spark.sql.DataFrame) = d.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("doc_id"),
        r.getAs[Int]("rank"), r.getAs[Long]("n_terms"),
        r.getAs[Double]("score")))
      .groupBy(_._1).view.mapValues(_.toSet).toMap
    val cut = byQuery(TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
      queries, "query_id", "term", k = 4,
      maxDf = TextAnalysis.bm25RecommendedMaxDf(4L)))
    val exact = byQuery(TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
      queries, "query_id", "term", k = 4))
    // a query with no over-half term is bit-identical under the cut
    // (df = n/2 terms like "data" are kept — the cut is df > n/2)
    assert(cut(0L) == exact(0L) && cut(0L).nonEmpty)
    // the hot-term query keeps its selective terms; "the" is gone =
    // result equals querying without it
    val noHot = byQuery(TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
      Seq(1L -> "flink", 1L -> "data").toDF("query_id", "term"),
      "query_id", "term", k = 4))
    assert(cut(1L) == noHot(1L))
  }

  test("bm25TopKMulti: one tf scan, per-query WindowGroupLimit heaps") {
    val s2g = spark
    import s2g.implicits._
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
    val queries = Seq(0L -> "spark", 1L -> "window").toDF("query_id", "term")
    val q = TextAnalysis.bm25TopKMulti(df, "doc_id", "text",
      queries, "query_id", "term", k = 5)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"),
      s"plan lacks WindowGroupLimit:\n$plan")
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"expected zero corpus scans after Materialize, got $scans:\n$plan")
  }

  test("ngramFamiliarity: mean corpus frequency of a doc's bigrams, exact") {
    val s2c = spark
    import s2c.implicits._
    val df = Seq(
      (1L, "a b c"),   // bigrams: "a b", "b c"
      (2L, "a b"),     // "a b"
      (3L, "b c d"),   // "b c", "c d"
      (4L, "z")        // no bigram -> excluded
    ).toDF("doc_id", "text")
    // corpus counts: "a b" = 2, "b c" = 2, "c d" = 1
    val out = TextAnalysis.ngramFamiliarity(df, "doc_id", "text")
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L))
    val byId = out.map(r => r.getLong(0) ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Long]("sum_freq"),
        r.getAs[Double]("familiarity"))).toMap
    assert(byId(1L) == ((2L, 4L, 2.0)))
    assert(byId(2L) == ((1L, 2L, 2.0)))
    assert(byId(3L) == ((2L, 3L, 1.5)))
  }

  test("ngramFamiliarity: hash-keyed counts equal string-keyed counts on the fixture corpus") {
    // the operator keys bigram identity on fnv64; the mirror keys on
    // strings. Equality holds exactly when no two distinct bigrams
    // collide — pin it on real data so the hash substitution is sound
    // at gate scale (a collision would also fail the driver gate
    // loudly; this localizes the diagnosis).
    import org.apache.spark.sql.functions._
    val df = spark.read.parquet(s"${sf("0.01")}/documents.parquet")
    val hashed = TextAnalysis.ngramFamiliarity(df, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val viaStrings = df
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), explode(expr(
        "transform(sequence(0, size(toks) - 2), " +
          "i -> concat(toks[i], ' ', toks[i + 1]))")).as("bg"))
    val counts = viaStrings.groupBy("bg").count()
    val expected = viaStrings.join(counts, "bg")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n"), sum("count").as("sf"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(hashed == expected)
  }

  test("ngramFamiliarity: one corpus scan (occurrence table materialized)") {
    val df = spark.read.parquet(s"${sf()}/documents.parquet")
    val plan = TextAnalysis.ngramFamiliarity(df, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val scans = "FileScan parquet".r.findAllIn(plan).size
    assert(scans == 0,
      s"expected the corpus scan to happen once inside Materialize, got $scans:\n$plan")
  }
}
