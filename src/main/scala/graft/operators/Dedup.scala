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

  /** Candidate pairs from (id, bucket) rows: ONE shuffle (groupBy
    * bucket + collect_list), in-bucket pair explosion via higher-order
    * functions, oversized buckets dropped (skew guard), then pair
    * dedup. Replaces a bucket self-join (which shuffles both sides and
    * recomputes the banding pipeline per consumer); the result is
    * checkpointed because every caller consumes it several times. */
  private def bucketPairs(bands: DataFrame, maxBucketSize: Int): DataFrame =
    bands.groupBy("bucket").agg(collect_list(col("id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucketSize))
      .withColumn("ids", array_sort(col("ids")))
      .select(explode(expr(
        """flatten(transform(ids, (x, i) ->
          |  transform(slice(ids, i + 2, size(ids) - i - 1),
          |            y -> struct(x AS a_id, y AS b_id))))""".stripMargin)).as("p"))
      .select(col("p.a_id"), col("p.b_id"))
      .dropDuplicates("a_id", "b_id")
      .localCheckpoint(true)

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
    // fused text→signature expression: no shingle arrays materialize on
    // the banding path (they are recomputed only for candidate pairs)
    val docs = df.select(
      col(idCol).as("id"),
      TextFunctions.minhashSigText(col(textCol), shingleN, numHashes).as("sig"))

    // (id, bucket) — bucket key hashes (band index, band slice of sig).
    // Only (id, bucket) flows through the self-join: shingle arrays are
    // joined back per-id AFTER pair dedup, so the wide payload never
    // crosses the bucket shuffle (at 100 TB the bands shuffle is
    // O(docs × bands × 16 bytes), not O(docs × bands × doc size)).
    val bands = docs.select(
      col("id"),
      explode(transform(
        sequence(lit(0), lit(numBands - 1)),
        b => xxhash64(b, slice(col("sig"), b * bandRows + 1, lit(bandRows))))).as("bucket"))

    val candidates = bucketPairs(bands, maxBucketSize)

    // shingle only the docs that appear in candidate pairs (broadcast
    // semi-join) — at scale the candidate set is tiny vs the corpus
    val candIds = candidates.select(col("a_id").as("id"))
      .union(candidates.select(col("b_id").as("id"))).distinct()
    val shingleSets = df
      .join(broadcast(candIds), col(idCol) === candIds("id"), "left_semi")
      .select(col(idCol).as("id"),
        TextFunctions.wordShingles(col(textCol), shingleN).as("sh"))
    candidates
      .join(shingleSets.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(shingleSets.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jaccard",
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
        size(array_union(col("a_sh"), col("b_sh"))))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Near-duplicate CLUSTERS: connected components over the LSH pair
    * graph by distributed min-label propagation. Each iteration is one
    * join + one aggregation; near-dup components have tiny diameters so
    * convergence is a handful of rounds (checked, bounded by maxIter).
    * The driver only coordinates rounds and reads a change counter —
    * all data stays distributed. Output: (id, cluster_id) where
    * cluster_id = min id in the component (singletons keep their id);
    * "keep one per cluster" dedup = filter id == cluster_id. */
  def clusters(df: DataFrame, idCol: String, textCol: String,
               threshold: Double = 0.8, maxIter: Int = 20): DataFrame =
    clustersFromPairs(df, idCol,
      minhashPairs(df, idCol, textCol, threshold = threshold), maxIter)

  /** Connected components from an existing (a_id, b_id) pair set —
    * lets callers reuse pairs they already computed (e.g. after
    * minhashPairs) instead of re-running the LSH pipeline. */
  def clustersFromPairs(df: DataFrame, idCol: String, pairsDf: DataFrame,
                        maxIter: Int = 20): DataFrame = {
    val pairs = pairsDf.select("a_id", "b_id")
    val und = pairs
      .union(pairs.select(col("b_id"), col("a_id")))
      .toDF("v", "nbr")
      .localCheckpoint(true)

    // iterate over the pair graph only — the near-dup subgraph is tiny
    // relative to the corpus, so each round joins O(pairs), not O(docs)
    var labels = und.select(col("v")).distinct()
      .withColumn("lbl", col("v")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels, "v")
        .groupBy(col("nbr")).agg(min("lbl").as("nlbl"))
        .withColumnRenamed("nbr", "v")
      // change flag computed in the same pass — one materialization per
      // round, then a cheap local count on the checkpointed result
      val updated = labels.join(nbrMin, Seq("v"), "left")
        .select(col("v"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("newLbl"),
          (coalesce(col("nlbl"), col("lbl")) < col("lbl")).as("chg"))
        .localCheckpoint(true)
      converged = updated.filter(col("chg")).limit(1).count() == 0
      labels = updated.select(col("v"), col("newLbl").as("lbl"))
      i += 1
    }
    // singletons (no near-dup edges) label themselves — no iteration
    df.select(col(idCol))
      .join(labels.withColumnRenamed("v", idCol), Seq(idCol), "left")
      .select(col(idCol), coalesce(col("lbl"), col(idCol)).as("cluster_id"))
  }

  /** Keep-one-per-cluster dedup: drop every near-duplicate except the
    * minimum-id representative of its cluster. */
  def dedupByMinhash(df: DataFrame, idCol: String, textCol: String,
                     threshold: Double = 0.8): DataFrame = {
    val keep = clusters(df, idCol, textCol, threshold)
      .filter(col(idCol) === col("cluster_id"))
      .select(col(idCol))
    df.join(keep, Seq(idCol), "left_semi")
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
      col("id"),
      explode(array(chunkCols: _*)).as("bucket"))

    bucketPairs(chunks, maxBucketSize = Int.MaxValue)
      .join(docs.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(docs.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
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
    // numTables × numPlanes × dim fixed hyperplanes; one custom
    // expression computes every table signature in a single pass
    val tables = Array.fill(numTables * numPlanes, dim)(rng.nextGaussian())

    val bands = vecs.select(col("id"),
      explode(graft.functions.VectorFunctions.hyperplaneBuckets(
        col("v"), tables, numTables, numPlanes)).as("bucket"))

    val candidates = bucketPairs(bands, maxBucketSize)

    candidates
      .join(vecs.select(col("id").as("a_id"), col("v").as("a_v")), Seq("a_id"))
      .join(vecs.select(col("id").as("b_id"), col("v").as("b_v")), Seq("b_id"))
      .withColumn("cosine", Similarity.cosine(col("a_v"), col("b_v")))
      .filter(col("cosine") >= minCosine)
      .select("a_id", "b_id", "cosine")
  }
}
