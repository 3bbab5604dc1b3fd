package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-level training-sequence packing — the "concat and chunk"
  * layout step of an LLM pretraining pipeline: documents are laid
  * head-to-tail into per-shard token streams and fixed-length
  * sequence windows are cut ACROSS document boundaries, so every
  * emitted sequence is exactly `seqLen` tokens with no padding (the
  * packing GPT-style pipelines use). Complements `doc_chunks`, which
  * windows WITHIN one document.
  *
  * Scale shape: the corpus-wide prefix sum is the crux — one global
  * concat stream would serialize it through a single task. Sharding
  * by pmod(xxhash64(id), shards) cuts the corpus into `shards`
  * independent token streams packed in parallel, which is also how
  * production pipelines shard packed pretraining data (each shard is
  * one output file series). Within a shard the order is plain id —
  * deterministic and partition/ingest-order independent, so
  * re-processing reproduces the identical layout. ONE shuffle (the
  * per-shard window); the span explosion is a pure projection
  * (`sequence` generator), no second exchange.
  */
object SequencePacking {

  private val Internal =
    Set("ntok", "shard", "start", "seq", "tok_from", "tok_to", "seq_off")

  /** One output row per (document × sequence it overlaps): `shard`,
    * `seq` (sequence index within the shard), `tok_from`/`tok_to`
    * (the doc-relative half-open token range landing in that
    * sequence), `seq_off` (where in the sequence the span starts).
    * Zero-token documents occupy no stream positions and emit
    * nothing. `ntokCol` must already hold the document's token count
    * (any tokenizer — the layout is tokenizer-agnostic). */
  def pack(docs: DataFrame, idCol: String, ntokCol: String,
           seqLen: Int, shards: Int): DataFrame = {
    require(seqLen >= 1, s"bad seqLen $seqLen")
    require(shards >= 1, s"bad shards $shards")
    require(!Internal.contains(idCol),
      s"id column '$idCol' collides with a packing output column")
    val id = col(idCol)
    // ROWS frame, not the default RANGE: RANGE treats ORDER-BY peers
    // (duplicate ids) as one frame, which would hand both duplicates
    // the same post-peer cumulative sum and silently overlap/gap the
    // layout. With ROWS each row gets its own prefix. Ids are expected
    // unique (duplicate ids still tile correctly but their relative
    // order — hence the exact layout — is not deterministic).
    val w = Window.partitionBy(col("shard")).orderBy(id)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val L = lit(seqLen.toLong)
    docs
      .select(id, col(ntokCol).cast("long").as("ntok"),
        pmod(xxhash64(id), lit(shards.toLong)).as("shard"))
      .filter(col("ntok") > 0)
      // stream offset of the doc's first token within its shard
      .withColumn("start", sum(col("ntok")).over(w) - col("ntok"))
      // every sequence index the doc's [start, start+ntok) span touches;
      // `div` (floor division on longs) keeps the arithmetic exact —
      // doubles would lose token offsets past 2^53 on a big corpus
      .withColumn("seq", explode(sequence(
        expr(s"start div ${seqLen}L"),
        expr(s"(start + ntok - 1) div ${seqLen}L"))))
      .select(id, col("shard"), col("seq"),
        greatest(col("seq") * L - col("start"), lit(0L)).as("tok_from"),
        least(col("ntok"), (col("seq") + 1) * L - col("start")).as("tok_to"),
        greatest(col("start") - col("seq") * L, lit(0L)).as("seq_off"))
  }
}
