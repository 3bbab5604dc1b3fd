package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** BPE (byte-pair-encoding) merge-table training over a corpus — the
  * tokenizer-training step of an LLM data pipeline (Sennrich et al.
  * 2016): repeatedly find the most frequent adjacent token pair and
  * merge it, emitting the ranked merge table.
  *
  * Scale shape (the classic one): training runs over the DISTINCT-WORD
  * FREQUENCY table, not the corpus — one corpus-wide
  * `groupBy(word).count()` up front (map-side combined, vocabulary-
  * sized result, Materialized once), then each merge round is a pair
  * count over that bounded table (explode adjacent pairs × sum(n)) +
  * a 1-row argmax collect + a pure per-row projection applying the
  * merge. A 100 TB corpus and a 100 GB corpus train at the same
  * per-round cost once the word table is built. Merges never cross
  * word boundaries (standard BPE).
  *
  * Determinism & mirroring: the best pair breaks ties by
  * (count DESC, left ASC, right ASC) in binary string order — the
  * same order DuckDB's default collation gives, so a SQL oracle can
  * replay the whole training run. The merge APPLY is expressed as a
  * literal `replace` over a separator-framed encoding of the token
  * list: each token t encodes as ` t `, tokens
  * concatenate, and merging pair (a, b) is
  * `replace(s, ␟a␟␟b␟, ␟ab␟)` — encodings of adjacent pairs are
  * DISJOINT substrings, so left-to-right non-overlapping replacement
  * (the semantics of BOTH Spark's and DuckDB's `replace`) merges
  * back-to-back occurrences exactly like the canonical greedy
  * left-to-right scan ("aaaa" + (a,a) → [aa, aa], never [aa, a, a]),
  * and a pattern can never start mid-token (tokens contain no
  * separator — enforced by the caller's corpus filter). */
object BpeTrainer {

  /** The token-list frame separator (ASCII unit separator). Input
    * words must not contain it. */
  val Sep = "\u001f"

  /** Encode a token-array column into the separator-framed string. */
  private def encode(tokens: Column): Column =
    concat(lit(Sep), array_join(tokens, Sep + Sep), lit(Sep))

  private def decode(s: Column): Column =
    split(regexp_replace(s, s"^$Sep|$Sep$$", ""), Sep + Sep)

  /** Train `numMerges` BPE merges over the corpus' words (space-split
    * from `textCol`, optionally pre-filtered by `wordFilter` — e.g.
    * "^[a-z]+$" to pin an ASCII-clean training set). Returns one row
    * per merge: (rank, left, right, pair_count), rank starting at 1.
    * Stops early when no pair reaches `minPairCount`.
    *
    * ADAPTIVE merge loop: the training table is vocabulary-sized —
    * orders smaller than the corpus — and each merge round only needs
    * THAT table. When it fits an explicit driver budget
    * (`driverVocabLimit` rows AND `driverVocabChars` framed chars,
    * measured by one bounded agg on the materialized table), the
    * merge rounds run IN MEMORY on the collected framed strings: an
    * occurrence-indexed incremental pair count plus a lazy max-heap
    * argmax, so a realistic 32k-merge vocabulary costs one distributed
    * word count + an in-memory loop instead of 32k sequential Spark
    * jobs and materializations (pure scheduling overhead on a table
    * that fits driver memory). Past the budget the distributed
    * round loop runs unchanged, so training never depends on the
    * vocabulary fitting anywhere. Both paths consume the SAME
    * Spark-built framed encoding and break argmax ties by (count
    * DESC, left, right) in UTF-8 binary order, so the merge tables
    * are identical by construction (spec-pinned). */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
                wordFilter: Option[String] = None,
                minPairCount: Long = 1L,
                driverVocabLimit: Long = 2000000L,
                driverVocabChars: Long = 128000000L): Seq[(Int, String, String, Long)] = {
    require(numMerges >= 1, s"numMerges must be >= 1, got $numMerges")
    val rawWords = df
      .select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val words = wordFilter.fold(rawWords)(f => rawWords.filter(col("word").rlike(f)))
    // the vocabulary-sized training table: distinct words + frequency,
    // materialized once — every merge round reads THIS, not the corpus
    var vocab = Materialize(
      words.groupBy("word").agg(count(lit(1)).as("n"))
        .select(encode(array_remove(split(col("word"), ""), "")).as("s"), col("n")))
    // one bounded action decides the strategy (rows + framed chars)
    val stats = vocab.agg(count(lit(1)), coalesce(sum(length(col("s"))), lit(0L)))
      .collect()(0)
    val (vocabRows, vocabChars) = (stats.getLong(0), stats.getLong(1))
    if (vocabRows <= driverVocabLimit && vocabChars <= driverVocabChars) {
      val local = vocab.collect().map(r => (r.getString(0), r.getLong(1)))
      return localMerges(local, numMerges, minPairCount)
    }
    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      val toks = decode(col("s"))
      val best = vocab
        .select(col("n"), explode(arrays_zip(
          slice(toks, lit(1), greatest(size(toks) - 1, lit(0))).as("a"),
          slice(toks, lit(2), greatest(size(toks) - 1, lit(0))).as("b"))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect()
      if (best.isEmpty || best.head.getLong(2) < minPairCount) done = true
      else {
        val (a, b, cnt) = (best.head.getString(0), best.head.getString(1),
          best.head.getLong(2))
        merges += ((rank, a, b, cnt))
        // apply the merge: ONE literal replace over the framed encoding
        vocab = Materialize(vocab.select(
          call_function("replace", col("s"),
            lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep")).as("s"),
          col("n")))
        rank += 1
      }
    }
    merges.toSeq
  }

  /** UTF-8 binary order — the comparison Spark's UTF8String `asc`
    * (and DuckDB's default collation) applies to the tie-break. Java's
    * String.compareTo is UTF-16 code-unit order, which DIVERGES on
    * BMP-vs-astral comparisons; this comparator replays the engines'. */
  private[operators] def utf8Compare(x: String, y: String): Int = {
    val a = x.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val b = y.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val n = math.min(a.length, b.length)
    var i = 0
    while (i < n) {
      val c = (a(i) & 0xff) - (b(i) & 0xff)
      if (c != 0) return c
      i += 1
    }
    a.length - b.length
  }

  /** In-memory merge loop over the collected framed vocabulary —
    * bit-identical semantics to the distributed rounds: adjacent-pair
    * counts weighted by word frequency, argmax tie-broken by (count
    * DESC, left UTF-8 ASC, right UTF-8 ASC), merge applied as the
    * greedy left-to-right non-overlapping scan (what literal `replace`
    * does on the framed encoding). Incremental: each round touches
    * only the words containing the merged pair (occurrence index) and
    * re-finds the argmax through a lazy max-heap (stale entries are
    * dropped when popped), so round cost is O(affected words + log
    * heap), not O(vocabulary). */
  private def localMerges(vocabRows: Array[(String, Long)], numMerges: Int,
                          minPairCount: Long): Seq[(Int, String, String, Long)] = {
    val sepSep = java.util.regex.Pattern.quote(Sep + Sep)
    // decode the framed strings the SAME way the distributed path does
    val toks: Array[Array[String]] = vocabRows.map { case (s, _) =>
      if (s.length <= 2) Array.empty[String]
      else s.substring(1, s.length - 1).split(sepSep, -1)
    }
    val freq: Array[Long] = vocabRows.map(_._2)

    val counts = new java.util.HashMap[(String, String), Long]()
    val occ = new java.util.HashMap[(String, String), java.util.HashSet[Int]]()
    def addWord(w: Int, sign: Long, touched: java.util.HashSet[(String, String)]): Unit = {
      val t = toks(w)
      var i = 0
      while (i + 1 < t.length) {
        val p = (t(i), t(i + 1))
        val c = counts.getOrDefault(p, 0L) + sign * freq(w)
        if (c == 0L) counts.remove(p) else counts.put(p, c)
        if (sign > 0)
          occ.computeIfAbsent(p, _ => new java.util.HashSet[Int]()).add(w)
        if (touched != null) touched.add(p)
        i += 1
      }
      if (sign < 0) { // occurrence sets are rebuilt on re-add
        i = 0
        while (i + 1 < t.length) {
          val p = (t(i), t(i + 1))
          val s = occ.get(p)
          if (s != null) { s.remove(w); if (s.isEmpty) occ.remove(p) }
          i += 1
        }
      }
    }
    var w = 0
    while (w < toks.length) { addWord(w, 1L, null); w += 1 }

    // lazy max-heap: (cnt, a, b) snapshots; an entry is live iff it
    // still equals the current count for its pair
    val ord = new java.util.Comparator[(Long, String, String)] {
      def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
        if (x._1 != y._1) return java.lang.Long.compare(y._1, x._1)
        val c = utf8Compare(x._2, y._2)
        if (c != 0) c else utf8Compare(x._3, y._3)
      }
    }
    val heap = new java.util.PriorityQueue[(Long, String, String)](
      math.max(counts.size, 16), ord)
    counts.forEach((p, c) => heap.add((c, p._1, p._2)))

    val merges = scala.collection.mutable.ArrayBuffer[(Int, String, String, Long)]()
    var rank = 1
    var done = false
    while (rank <= numMerges && !done) {
      var top: (Long, String, String) = null
      while (top == null && !heap.isEmpty) {
        val cand = heap.poll()
        if (counts.getOrDefault((cand._2, cand._3), 0L) == cand._1) top = cand
      }
      if (top == null || top._1 < minPairCount) done = true
      else {
        val (cnt, a, b) = top
        merges += ((rank, a, b, cnt))
        val affected = occ.get((a, b))
        if (affected != null) {
          val snapshot = affected.toArray(new Array[Integer](0))
          val touched = new java.util.HashSet[(String, String)]()
          snapshot.foreach { wi =>
            val wIdx = wi.intValue()
            addWord(wIdx, -1L, touched)
            // greedy left-to-right non-overlapping merge — the exact
            // semantics of literal replace over the framed encoding
            val t = toks(wIdx)
            val out = new scala.collection.mutable.ArrayBuffer[String](t.length)
            var i = 0
            while (i < t.length) {
              if (i + 1 < t.length && t(i) == a && t(i + 1) == b) {
                out += (a + b); i += 2
              } else { out += t(i); i += 1 }
            }
            toks(wIdx) = out.toArray
            addWord(wIdx, 1L, touched)
          }
          touched.forEach { p =>
            val c = counts.getOrDefault(p, 0L)
            if (c > 0L) heap.add((c, p._1, p._2))
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** The merge table as a DataFrame (for the driver gate). */
  def bpeMergesDf(df: DataFrame, textCol: String, numMerges: Int,
                  wordFilter: Option[String] = None,
                  minPairCount: Long = 1L,
                  driverVocabLimit: Long = 2000000L,
                  driverVocabChars: Long = 128000000L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeMerges(df, textCol, numMerges, wordFilter, minPairCount,
        driverVocabLimit, driverVocabChars)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Apply a learned merge table to text: per word, frame the
    * character sequence and run the merges in rank order (each one a
    * literal replace — same semantics as training). Returns the
    * token array per input row. */
  def bpeSegment(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val applied = mergeChain(merges, col("__word"))
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__word"))
      .filter(col("__word") =!= "")
      .select(col(idCol), col("__word").as("word"), decode(applied).as("tokens"))
  }

  /** The framed-encoding merge chain applied to one word column —
    * shared by [[bpeSegment]] and [[bpeSegmentVocab]] so the two can
    * never drift on replace semantics. */
  private def mergeChain(merges: Seq[(String, String)], word: Column): Column =
    merges.foldLeft(encode(array_remove(split(word, ""), "")): Column) {
      case (acc, (a, b)) =>
        call_function("replace", acc,
          lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep"))
    }

  /** Segment the corpus' DISTINCT words with occurrence counts — the
    * aggregate-before-segment form of [[bpeSegment]] for consumers
    * that only need per-WORD segmentations (not per-document token
    * streams): count word occurrences first (map-side combined,
    * vocabulary-sized result), then run the merge chain ONCE per
    * distinct word instead of once per corpus occurrence. A word's
    * segmentation is a pure function of the word, so
    * `bpeSegmentVocab(df) ≡ bpeSegment(df).groupBy(word, tokens)
    * .agg(count)` row-for-row (spec-pinned) — at corpus scale this is
    * the difference between O(total words) and O(|vocab|) replace
    * chains (guide: aggregate before the expensive projection).
    * Returns (word, tokens, n). */
  def bpeSegmentVocab(df: DataFrame, textCol: String,
                      merges: Seq[(String, String)],
                      wordFilter: Option[String] = None): DataFrame = {
    val rawWords = df.select(explode(split(col(textCol), " ")).as("word"))
      .filter(col("word") =!= "")
    val words = wordFilter.fold(rawWords)(f => rawWords.filter(col("word").rlike(f)))
    words.groupBy("word").agg(count(lit(1)).as("n"))
      .select(col("word"), decode(mergeChain(merges, col("word"))).as("tokens"),
        col("n"))
  }
}
