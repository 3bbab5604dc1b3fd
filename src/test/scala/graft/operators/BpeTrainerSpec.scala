package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainerSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  /** Greedy left-to-right merge of one pair in a token sequence. */
  private def applyMerge(toks: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += a + b; i += 2
      } else { out += toks(i); i += 1 }
    }
    out.toSeq
  }

  /** Canonical in-memory BPE: pair counts over the word-frequency
    * table, (count desc, pair asc) argmax, greedy left-to-right merge. */
  private def refBpe(words: Map[String, Long], k: Int): Seq[(Int, String, String, Long)] = {
    var vocab: Map[Seq[String], Long] = words.toSeq
      .groupBy { case (w, _) => w.map(_.toString): Seq[String] }
      .view.mapValues(_.map(_._2).sum).toMap
    (1 to k).flatMap { rank =>
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      vocab.foreach { case (toks, n) =>
        toks.zip(toks.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + n)
      }
      if (counts.isEmpty) None
      else {
        val ((a, b), cnt) = counts.minBy { case ((x, y), c) => (-c, x, y) }
        vocab = vocab.toSeq
          .map { case (toks, n) => (applyMerge(toks, a, b), n) }
          .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
        Some((rank, a, b, cnt))
      }
    }
  }

  private def train(texts: Seq[String], k: Int): Seq[(Int, String, String, Long)] =
    BpeTrainer.bpeMerges(texts.zipWithIndex.map(_.swap).toDF("id", "text"),
      "text", numMerges = k)

  test("merges match the canonical greedy reference") {
    val texts = Seq("low lower lowest", "low low newer newest", "wider new new")
    val words = texts.flatMap(_.split(" ")).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(train(texts, 6) == refBpe(words, 6))
  }

  test("back-to-back merges behave like the greedy scan (aaaa -> aa aa)") {
    // one word "aaaa" x3 plus noise so (a,a) wins round 1
    val merges = train(Seq("aaaa aaaa aaaa xy"), 2)
    assert(merges.head._2 == "a" && merges.head._3 == "a")
    // 3 words x 3 overlapping adjacent pairs = 9 counted pairs
    assert(merges.head._4 == 9L)
    // round 2: each "aaaa" is now [aa, aa] -> pair (aa, aa) count 3
    assert(merges(1)._2 == "aa" && merges(1)._3 == "aa" && merges(1)._4 == 3L)
  }

  test("merges never cross word boundaries") {
    // the pair (a, b) occurs ONLY across the "xa"|"bx" word boundary;
    // training must never produce it, no matter how many rounds
    val merges = train(Seq("xa bx xa bx xa bx cd cd"), 6)
    assert(!merges.exists(m => m._2 == "a" && m._3 == "b"),
      s"cross-boundary pair merged: $merges")
    // and the in-word pairs it DOES produce match the reference
    val words = "xa bx xa bx xa bx cd cd".split(" ").groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    assert(merges == refBpe(words, 6))
  }

  test("bpeSegment applies the learned table like training did") {
    val texts = Seq("low lower lowest low low")
    val merges = train(texts, 4).map(m => (m._2, m._3))
    val got = BpeTrainer.bpeSegment(
        texts.zipWithIndex.map(_.swap).toDF("id", "text"), "id", "text", merges)
      .collect().map(r => r.getString(1) -> r.getSeq[String](2).toSeq).toMap
    // applying the same merges by hand
    def segment(word: String): Seq[String] =
      merges.foldLeft(word.map(_.toString): Seq[String]) {
        case (toks, (a, b)) => applyMerge(toks, a, b)
      }
    got.foreach { case (w, toks) => assert(toks == segment(w), s"word $w") }
    // every token reassembles to its word
    got.foreach { case (w, toks) => assert(toks.mkString == w) }
  }

  test("bpeSegmentVocab == bpeSegment + groupBy(word) occurrence counts") {
    // includes a filtered-out token (digits), an empty-split artifact
    // (double space) and repeated words so the counts are non-trivial
    val texts = Seq("low lower lowest low low 42 low",
      "wide  wider low newest")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val merges = train(texts, 4).map(m => (m._2, m._3))
    val expected = BpeTrainer.bpeSegment(df, "id", "text", merges)
      .filter(col("word").rlike("^[a-z]+$"))
      .groupBy(col("word"), array_join(col("tokens"), " ").as("toks"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    val got = BpeTrainer.bpeSegmentVocab(df, "text", merges,
        wordFilter = Some("^[a-z]+$"))
      .select(col("word"), array_join(col("tokens"), " ").as("toks"), col("n"))
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    assert(got.nonEmpty && got.exists(_._3 > 1))
  }

  test("adaptive paths agree: in-memory loop == distributed rounds") {
    // ties on count force the (left, right) binary-order tiebreak, and
    // the BMP non-ASCII words make UTF-8 byte order observable (Java's
    // UTF-16 compareTo would order some of these differently)
    val texts = Seq(
      "low lower lowest low low newer newest wider new new",
      "aaaa aaaa banana bandana cabana",
      "ｚｚ ｚｚ 日本 日本 日本語 ééé ééé zzz zzz")
    val df = texts.zipWithIndex.map(_.swap).toDF("id", "text")
    val local = BpeTrainer.bpeMerges(df, "text", numMerges = 12)
    val dist = BpeTrainer.bpeMerges(df, "text", numMerges = 12,
      driverVocabLimit = 0L) // force the distributed round loop
    assert(local == dist, s"paths diverged:\nlocal $local\ndist  $dist")
    assert(local.nonEmpty)
  }

  test("in-memory loop handles a 1000-merge budget (early stop when dry)") {
    // enough distinct structure for many rounds; asserts the loop is
    // robust far past the gate's 5 merges and ranks stay dense
    val texts = (0 until 200).map(i => s"w${i}abcdefgh w${i}abcdefgh prefix${i % 7}common")
    val merges = BpeTrainer.bpeMerges(
      texts.zipWithIndex.map(_.swap).toDF("id", "text"), "text", numMerges = 1000)
    assert(merges.map(_._1) == (1 to merges.length))
    assert(merges.length > 20)
    // counts are non-increasing in a valid greedy BPE only per affected
    // lineage, but the FIRST merge must be the global max
    assert(merges.head._4 == merges.map(_._4).max)
  }

  test("wordFilter pins the training set; early stop below minPairCount") {
    val merges = BpeTrainer.bpeMerges(
      Seq((1, "aa aa BB BB BB")).toDF("id", "text"), "text",
      numMerges = 10, wordFilter = Some("^[a-z]+$"))
    // only "aa" words survive the filter: single merge (a,a), then the
    // merged token has no pairs left -> early stop
    assert(merges == Seq((1, "a", "a", 2L)))
  }
}
