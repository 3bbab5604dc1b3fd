package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextFunctionsSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  test("word shingles: distinct n-grams joined by spaces") {
    val got = Seq("a b c d a b c d").toDF("t")
      .select(TextFunctions.wordShingles($"t", 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(got.toSet == Set("a b c", "b c d", "c d a", "d a b"))
  }

  test("shingles of short text are empty") {
    val got = Seq("a b").toDF("t")
      .select(TextFunctions.wordShingles($"t", 3).as("sh"))
      .collect()(0).getSeq[String](0)
    assert(got.isEmpty)
  }

  test("fused WordShingles ≡ composed split/transform form (incl. empty tokens, unicode)") {
    // the fusion (one split per row) must be OBSERVATIONALLY identical
    // to the composed Catalyst form it replaced — same order, same
    // first-occurrence distinct, same empty-token and short-text edges
    import org.apache.spark.sql.types.{ArrayType, StringType}
    def composed(text: org.apache.spark.sql.Column, n: Int) = {
      val words = split(text, " ")
      val cnt = size(words) - lit(n - 1)
      when(cnt < 1, array().cast(ArrayType(StringType, containsNull = false)))
        .otherwise(array_distinct(transform(
          sequence(lit(1), cnt),
          i => concat_ws(" ", (0 until n).map(j => element_at(words, i + lit(j))): _*))))
    }
    val rng = new scala.util.Random(7)
    val alphabet = Vector("a", "b", "ab", "", "日本語", "x🎉", "c")
    val texts = Seq("", " ", "  ", "a", "a b", "a  b ", " a b c a b c") ++
      (1 to 40).map(_ => (0 until rng.nextInt(12)).map(_ => alphabet(rng.nextInt(alphabet.size))).mkString(" "))
    for (n <- 1 to 4) {
      val rows = texts.toDF("t")
        .select($"t", TextFunctions.wordShingles($"t", n).as("fused"), composed($"t", n).as("ref"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"n=$n text='${r.getString(0)}': fused=${r.getSeq[String](1)} ref=${r.getSeq[String](2)}")
      }
    }
  }

  test("minhash signature: equal sets → equal sigs; sim ≈ jaccard") {
    val df = Seq(
      ("x", "a b c d e f g h i j k l m n o p"),
      ("y", "a b c d e f g h i j k l m n o p"),
      ("z", "q r s t u v w x y z a2 b2 c2 d2 e2 f2"))
      .toDF("id", "t")
      .select($"id", TextFunctions.minhashSig(TextFunctions.wordShingles($"t", 2), 256).as("sig"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    assert(m("x") == m("y"))
    val simXZ = m("x").zip(m("z")).count { case (a, b) => a == b } / 256.0
    assert(simXZ < 0.15, s"disjoint sets should rarely collide, got $simXZ")
  }

  test("simhash: identical inputs equal; near inputs close; far inputs far") {
    val df = Seq(
      ("a", "the quick brown fox jumps over the lazy dog today ok fine"),
      ("b", "the quick brown fox jumps over the lazy dog today ok good"),
      ("c", "completely different words altogether nothing shared here at all everybody"))
      .toDF("id", "t")
      .select($"id", TextFunctions.simhash64(split($"t", " ")).as("h"))
    val m = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val near = java.lang.Long.bitCount(m("a") ^ m("b"))
    val far = java.lang.Long.bitCount(m("a") ^ m("c"))
    assert(near < far, s"near=$near far=$far")
  }

  test("simhashKeysFromHash(simhash64(tokens)) ≡ simhashKeys(tokens)") {
    // the stored-hash key path must bucket identically to the fused
    // text path for every (numChunks, maxHamming) shape in use
    val texts = Seq("a b c d e f g h", "the quick brown fox", "x", "")
    for ((nc, mh) <- Seq((6, 3), (4, 3), (5, 2), (16, 1))) {
      val rows = texts.toDF("t")
        .select(
          TextFunctions.simhashKeys(split($"t", " "), nc, mh).as("direct"),
          TextFunctions.simhashKeysFromHash(
            TextFunctions.simhash64(split($"t", " ")), nc, mh).as("stored"))
        .collect()
      rows.foreach(r => assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"nc=$nc mh=$mh"))
    }
  }

  test("winnowing: substring sharing implies shared fingerprints") {
    val common = "the common substring shared by both documents here"
    val df = Seq(
      ("a", s"prefix one $common suffix alpha"),
      ("b", s"other beginning text $common distinct ending"),
      ("c", "entirely unrelated content with zero overlap whatsoever"))
      .toDF("id", "t")
      .select($"id", TextFunctions.winnowFingerprints($"t", 8, 4).as("fp"))
    val m = df.collect().map(r => r.getString(0) -> r.getSeq[Long](1).toSet).toMap
    assert((m("a") & m("b")).nonEmpty, "shared substring → shared fingerprints")
    assert((m("a") & m("b")).size > (m("a") & m("c")).size)
  }

  test("winnowing hashes CODEPOINT k-grams — non-ASCII and astral text") {
    // the fingerprint must be encoding-canonical: FNV-1a over the
    // codepoint sequence, so astral chars (1 codepoint, 2 UTF-16
    // units, 4 UTF-8 bytes) count as ONE gram position — exactly what
    // the DuckDB mirror's unicode()/character indexing computes
    val text = "héllo 日本語 🎉 wörld padding here"
    val k = 4; val w = 3
    val got = Seq(text).toDF("t")
      .select(TextFunctions.winnowFingerprints($"t", k, w).as("fp"))
      .collect()(0).getSeq[Long](0).toSet
    val cps = text.codePoints().toArray
    val hashes = (0 to cps.length - k).map { i =>
      var h = 0xcbf29ce484222325L
      (0 until k).foreach { j => h ^= cps(i + j).toLong; h *= 0x100000001b3L }
      h
    }
    val want = (0 to hashes.length - w).map(s => hashes.slice(s, s + w).min).toSet
    assert(got == want, s"got $got want $want")
  }

  test("winnowing of short text is empty, not an error") {
    val got = Seq("tiny").toDF("t")
      .select(TextFunctions.winnowFingerprints($"t", 8, 4).as("fp"))
      .collect()(0).getSeq[Long](0)
    assert(got.isEmpty)
  }

  test("token counts: whitespace and regex variants") {
    val df = Seq(("hello world, 42 ok!", 1), ("", 2)).toDF("t", "i")
      .select(
        TextFunctions.tokenCount($"t").as("ws"),
        TextFunctions.regexTokenCount($"t").as("re"),
        $"i")
    val rows = df.orderBy($"i").collect()
    assert(rows(0).getInt(0) == 4)
    // hello | world | , | 4 | 2 | ok | !
    assert(rows(0).getInt(1) == 7)
    assert(rows(1).getInt(0) == 0)
    assert(rows(1).getInt(1) == 0)
  }

  test("TermCounts ≡ explode(split) → groupBy(doc, term) → count, incl. edge cases") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "a b a c b a"),            // repeats
      (2L, ""),                        // empty text → no terms
      (3L, "x  y"),                    // double space → empty token dropped
      (4L, " lead trail "),            // leading/trailing spaces
      (5L, "solo"),
      (6L, "ü ü é")                    // unicode terms
    ).toDF("doc_id", "text")
    val fused = docs.select(col("doc_id"),
        explode(TextFunctions.termCounts(col("text"))).as("p"))
      .select(col("doc_id"), col("p.term").as("term"), col("p.tf").as("tf"))
    val agg = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val f = fused.orderBy("doc_id", "term").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val a = agg.orderBy("doc_id", "term").collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(f.toSeq == a.toSeq)
    // dl (sum of tf) per doc matches, and the empty doc has NO row
    val dl = docs.select(col("doc_id"),
        TextFunctions.termCounts(col("text")).as("__tc"))
      .filter(size(col("__tc")) > 0)
      .select(col("doc_id"),
        expr("aggregate(__tc, CAST(0 AS BIGINT), (a, x) -> a + x.tf)").as("dl"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dl.toSeq == Seq((1L, 6L), (3L, 2L), (4L, 2L), (5L, 1L), (6L, 3L)))
  }

  test("VocabPairs ≡ vocab join + t1<t2 self-join pair counts") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Seq(
      (1L, "b a c b"), (2L, "a zz c"), (3L, "q"), (4L, ""),
      (5L, "é a b"), (6L, "a a a b")
    ).toDF("doc_id", "text")
    val vocab = Seq(("a", 4L), ("b", 3L), ("c", 2L), ("é", 1L))
    // fused in-row pairs
    val fused = docs.select(explode(TextFunctions.vocabPairs(
        TextFunctions.termCounts(col("text")), vocab)).as("p"))
      .groupBy("p.t1", "p.t2", "p.n_a", "p.n_b").agg(count(lit(1)).as("n_ab"))
    // reference: distinct incidence ⋈ vocab, doc-keyed self-join, t1<t2
    val inc = docs.select(col("doc_id"),
        explode(split(col("text"), " ")).as("term"))
      .filter(col("term") =!= "").distinct()
      .join(vocab.toDF("term", "n_docs"), Seq("term"))
    val a = inc.select(col("doc_id"), col("term").as("t1"), col("n_docs").as("n_a"))
    val b = inc.select(col("doc_id"), col("term").as("t2"), col("n_docs").as("n_b"))
    val ref = a.join(b, Seq("doc_id")).filter(col("t1") < col("t2"))
      .groupBy("t1", "t2", "n_a", "n_b").agg(count(lit(1)).as("n_ab"))
    val f = fused.orderBy("t1", "t2").collect().map(_.toSeq).toSeq
    val r = ref.orderBy("t1", "t2").collect().map(_.toSeq).toSeq
    assert(f == r && f.nonEmpty)
  }
}
