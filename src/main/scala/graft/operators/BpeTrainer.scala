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
    * Stops early when no pair reaches `minPairCount`. */
  def bpeMerges(df: DataFrame, textCol: String, numMerges: Int,
                wordFilter: Option[String] = None,
                minPairCount: Long = 1L): Seq[(Int, String, String, Long)] = {
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

  /** The merge table as a DataFrame (for the driver gate). */
  def bpeMergesDf(df: DataFrame, textCol: String, numMerges: Int,
                  wordFilter: Option[String] = None,
                  minPairCount: Long = 1L): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    bpeMerges(df, textCol, numMerges, wordFilter, minPairCount)
      .toDF("rank", "left", "right", "pair_count")
  }

  /** Apply a learned merge table to text: per word, frame the
    * character sequence and run the merges in rank order (each one a
    * literal replace — same semantics as training). Returns the
    * token array per input row. */
  def bpeSegment(df: DataFrame, idCol: String, textCol: String,
                 merges: Seq[(String, String)]): DataFrame = {
    val applied = merges.foldLeft(
        encode(array_remove(split(col("__word"), ""), "")): Column) {
      case (acc, (a, b)) =>
        call_function("replace", acc,
          lit(s"$Sep$a$Sep$Sep$b$Sep"), lit(s"$Sep$a$b$Sep"))
    }
    df.select(col(idCol), explode(split(col(textCol), " ")).as("__word"))
      .filter(col("__word") =!= "")
      .select(col(idCol), col("__word").as("word"), decode(applied).as("tokens"))
  }
}
