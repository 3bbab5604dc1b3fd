package graft.operators

import graft.functions.{Pq, Quantize}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar int8 (SQ8) embedding quantization + quantized similarity
  * search — the memory-scale path for ANN over a 100 TB embedding
  * corpus: 8 bits per dimension instead of 32 (float) or 64 (the
  * double working form), with integer (exact, deterministic) scoring.
  *
  * Pipeline shape:
  *   1. `fitBounds` — ONE pass over the corpus computes per-dimension
  *      min/max (posexplode → groupBy(pos) with map-side partial agg;
  *      the shuffle carries dim × partitions partial rows, never
  *      data). The result is dim-bounded and driver-collected, like a
  *      centroid table.
  *   2. `withCodes` — a pure projection: the fused `QuantizeInt8`
  *      expression emits one BINARY code vector per row. No shuffle.
  *   3. `quantizedTopK` — same broadcast shape as brute-force ANN
  *      (queries are the small side), but candidates score by the
  *      DEQUANTIZED cosine (`DequantCosine`): each byte reconstructs
  *      to its bin center and the usual sequential cosine fold runs
  *      over the reconstructions — the asymmetric-distance (ADC)
  *      scoring every SQ8 index uses. All steps are exactly-rounded
  *      IEEE ops, so scores are bit-identical cross-engine; rank ties
  *      break on neighbor id.
  *
  * Quantized cosine is a *proxy* ranking (as in any SQ8 index): recall
  * vs exact cosine is spec-tested; production retrieval re-ranks the
  * short quantized candidate list with full-precision vectors, which
  * composes here as `bruteTopK` over `quantizedTopK` survivors.
  */
object Quantization {

  private def asDouble(c: org.apache.spark.sql.Column) =
    transform(c, x => x.cast("double"))

  /** Per-dimension (lo, hi) over the corpus vector column, collected
    * to the driver (bounded: one row per dimension). */
  def fitBounds(corpus: DataFrame, vecCol: String): (Seq[Double], Seq[Double]) = {
    val stats = corpus
      .select(posexplode(asDouble(col(vecCol))).as(Seq("pos", "x")))
      .groupBy("pos").agg(min("x").as("lo"), max("x").as("hi"))
      .orderBy("pos")
      .collect()
    (stats.map(_.getDouble(1)).toSeq, stats.map(_.getDouble(2)).toSeq)
  }

  /** Project `(idCol, code)` — the SQ8 code vector as BINARY. */
  def withCodes(df: DataFrame, idCol: String, vecCol: String,
                los: Seq[Double], his: Seq[Double]): DataFrame =
    df.select(col(idCol), Quantize.int8(asDouble(col(vecCol)), los, his).as("code"))

  /** Deterministic PQ codebook (Jégou et al. 2011): subspace `j`'s
    * entries are the `j`-th subvectors of the `ks` LOWEST-ID corpus
    * vectors — the same deterministic-seed stance as
    * [[Similarity.defaultCentroids]], which is what makes the whole
    * PQ path SQL-mirrorable (the oracle derives the identical
    * codebook with ORDER BY id LIMIT ks). Pass
    * [[Similarity.kmeansCentroids]]-refined entries per subspace for
    * data-adaptive quality where cross-engine exactness isn't needed.
    * Driver-collected and bounded: ks rows (m × ks × D/m doubles —
    * centroid-table-sized). */
  def trainPqCodebook(corpus: DataFrame, idCol: String, vecCol: String,
                      m: Int, ks: Int): Seq[Seq[Seq[Double]]] = {
    require(m >= 1, s"bad m $m")
    require(ks >= 1 && ks <= 256, s"bad ks $ks (codes are one byte)")
    val rows = corpus
      .select(col(idCol).as("n_id"), asDouble(col(vecCol)).as("n_v"))
      .orderBy(col("n_id")).limit(ks)
      .select(col("n_v")).collect().map(_.getSeq[Double](0))
    require(rows.nonEmpty, "trainPqCodebook: empty corpus")
    val dim = rows.head.length
    require(dim % m == 0,
      s"trainPqCodebook: dim $dim is not divisible by m = $m")
    require(rows.forall(_.length == dim),
      "trainPqCodebook: inconsistent vector dimensions")
    val subDim = dim / m
    (0 until m).map(j =>
      rows.toSeq.map(v => v.slice(j * subDim, (j + 1) * subDim)))
  }

  /** Top-k neighbors per query by PQ asymmetric-distance cosine: the
    * corpus stores `m` BYTES per vector (32× smaller than float32 at
    * D=64/m=8), queries stay full-precision, scoring reconstructs each
    * candidate from the codebook ([[graft.functions.Pq.adcCosine]]).
    * Same broadcast shape as [[quantizedTopK]]; ranking is a proxy —
    * production re-ranks survivors with full-precision vectors
    * ([[Similarity.rerankCandidates]] composes). */
  def pqTopK(corpus: DataFrame, queries: DataFrame,
             idCol: String, vecCol: String, m: Int = 8, ks: Int = 256,
             k: Int = 10): DataFrame = {
    val codebook = trainPqCodebook(corpus, idCol, vecCol, m, ks)
    val c = corpus.select(col(idCol).as("n_id"),
      Pq.encode(asDouble(col(vecCol)), codebook).as("n_code"))
    val q = queries.select(col(idCol).as("q_id"),
      asDouble(col(vecCol)).as("q_v"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("n_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("qcos",
        Pq.adcCosine(col("q_v"), col("n_code"), codebook))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "qcos")
  }

  /** Top-k neighbors per query by dequantized (ADC) cosine. Bounds are
    * fit on the corpus; queries quantize under the SAME bounds (the
    * index's codebook — queries may lie outside it, codes clamp). */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, k: Int = 10): DataFrame = {
    val (los, his) = fitBounds(corpus, vecCol)
    val c = withCodes(corpus, idCol, vecCol, los, his)
      .select(col(idCol).as("n_id"), col("code").as("n_code"))
    val q = withCodes(queries, idCol, vecCol, los, his)
      .select(col(idCol).as("q_id"), col("code").as("q_code"))
    val w = Window.partitionBy("q_id").orderBy(col("qcos").desc, col("n_id").asc)
    c.join(broadcast(q), col("q_id") =!= col("n_id"))
      .withColumn("qcos",
        Quantize.dequantCosine(col("q_code"), col("n_code"), los, his))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("q_id", "n_id", "rank", "qcos")
  }
}
