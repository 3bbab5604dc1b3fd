package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for large-scale document pipelines.
  *
  * Scale design: nothing here ever materializes the O(n²) pair space.
  *  - exact: one shuffle on a 64-bit text hash (tiny keys, not full
  *    documents); `min(id)` keeps a canonical representative.
  *  - MinHash+LSH: per-band bucket join; only ids sharing a band
  *    bucket meet, and buckets above `maxBucketSize` are dropped (skew
  *    guard — a degenerate value, e.g. the empty document, would
  *    otherwise create a quadratic bucket). Candidates are then
  *    verified with exact shingle Jaccard, so false positives from
  *    banding (or bucket-hash collisions) never reach the output.
  *  - SimHash: 4×16-bit chunk buckets; hamming ≤ 3 ⇒ at least one
  *    chunk equal (pigeonhole), so bucketing is lossless for the
  *    verify threshold — exact result, no O(n²).
  */
object Dedup {

  /** Exact dedup: one row per distinct text with the minimum id as the
    * canonical copy and the duplicate count. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(xxhash64(col(textCol)).as("__h"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_copies"))
      .drop("__h")

  /** MinHash+LSH near-duplicate pairs, exact-verified.
    *
    * numHashes = bandRows × numBands. With r=2, b=64 the probability of
    * missing a pair at Jaccard 0.8 is (1−0.8²)^64 ≈ 1e-28 — the output
    * is the full set of pairs ≥ threshold for any realistic input.
    */
  def minhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 128, bandRows: Int = 2,
      threshold: Double = 0.8, maxBucketSize: Int = 1000): DataFrame = {
    val numBands = numHashes / bandRows
    val docs = df.select(
        col(idCol).as("id"),
        TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
      .withColumn("sig", TextFunctions.minhashSig(col("sh"), numHashes))

    // (id, bucket) — bucket key hashes (band index, band slice of sig)
    val bands = docs.select(
      col("id"), col("sh"),
      explode(transform(
        sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(b, slice(col("sig"), b * bandRows + 1, lit(bandRows))))).as("bucket"))

    // skew guard: drop degenerate buckets before the self-join
    val sized = bands
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("bn") <= maxBucketSize)
      .drop("bn")

    val a = sized.select(col("id").as("a_id"), col("sh").as("a_sh"), col("bucket"))
    val b = sized.select(col("id").as("b_id"), col("sh").as("b_sh"), col("bucket"))
    val candidates = a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id", "a_sh", "b_sh")
      .dropDuplicates("a_id", "b_id")

    candidates
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** SimHash near-duplicate pairs with hamming distance ≤ maxHamming.
    * Exact for maxHamming ≤ 3 (pigeonhole over 4 chunk buckets). */
  def simhashPairs(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    require(maxHamming <= 3, "4-chunk bucketing is lossless only for hamming <= 3")
    val docs = df.select(
      col(idCol).as("id"),
      TextFunctions.simhash64(split(col(textCol), " ")).as("sh"))

    val chunkCols = (0 until 4).map(c =>
      concat(lit(s"$c:"),
        shiftrightunsigned(col("sh"), c * 16).bitwiseAND(lit(0xffffL)).cast("string")))
    val chunks = docs.select(
      col("id"), col("sh"),
      explode(array(chunkCols: _*)).as("bucket"))

    val a = chunks.select(col("id").as("a_id"), col("sh").as("a_sh"), col("bucket"))
    val b = chunks.select(col("id").as("b_id"), col("sh").as("b_sh"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("hamming", bit_count(col("a_sh").bitwiseXOR(col("b_sh"))))
      .filter(col("hamming") <= maxHamming)
      .select("a_id", "b_id", "hamming")
  }

  /** Exact n-gram Jaccard over all pairs in an id range — the
    * verification primitive by itself (bounded input: quadratic). */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, minJaccard: Double = 0.1, maxId: Long = Long.MaxValue): DataFrame = {
    val docs = df.filter(col(idCol) < maxId).select(
      col(idCol).as("id"), TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
    val a = docs.select(col("id").as("a_id"), col("sh").as("a_sh"))
    val b = docs.select(col("id").as("b_id"), col("sh").as("b_sh"))
    a.crossJoin(b).filter(col("a_id") < col("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= minJaccard)
      .select("a_id", "b_id", "jaccard")
  }

  /** Embedding near-duplicate pairs via random-hyperplane LSH buckets +
    * exact cosine verify. Deterministic hyperplanes (fixed seed). */
  def embeddingPairs(
      df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.9, numPlanes: Int = 16, numTables: Int = 8,
      maxBucketSize: Int = 10000): DataFrame = {
    val vecs = df.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))

    val dim = vecs.select(size(col("v"))).first().getInt(0)
    val rng = new java.util.Random(42)
    // numTables × numPlanes × dim fixed hyperplanes, broadcast as literals
    val tables = Array.fill(numTables, numPlanes, dim)(rng.nextGaussian())

    val bucketCols: Seq[Column] = tables.zipWithIndex.map { case (planes, t) =>
      val bits: Seq[Column] = planes.toSeq.map { plane =>
        val planeArr = array(plane.map(lit): _*)
        val dot = aggregate(zip_with(col("v"), planeArr, (x, p) => x * p), lit(0.0), _ + _)
        when(dot >= 0, lit(1)).otherwise(lit(0))
      }
      concat(lit(s"$t:") +: bits.map(_.cast("string")): _*)
    }.toSeq

    val bands = vecs.select(col("id"), col("v"), explode(array(bucketCols: _*)).as("bucket"))
    val sized = bands
      .withColumn("bn", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("bucket")))
      .filter(col("bn") <= maxBucketSize)
      .drop("bn")

    val a = sized.select(col("id").as("a_id"), col("v").as("a_v"), col("bucket"))
    val b = sized.select(col("id").as("b_id"), col("v").as("b_v"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("a_id") < col("b_id"))
      .dropDuplicates("a_id", "b_id")
      .withColumn("cosine", Similarity.cosine(col("a_v"), col("b_v")))
      .filter(col("cosine") >= minCosine)
      .select("a_id", "b_id", "cosine")
  }
}
