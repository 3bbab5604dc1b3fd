package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing: media as opaque
  * `binary` columns with typed metadata structs, batch decode /
  * feature-extract over partitions.
  *
  * Codecs are pluggable behind `MediaCodec`/`AudioCodec`/
  * `MediaResizer`. The IMAGE path is REAL — `ImageIoCodec`/
  * `ImageIoResizer` decode and resize actual JPEG/PNG/GIF/BMP bytes
  * via the JDK's dependency-free javax.imageio — and so is AUDIO:
  * `JavaSoundCodec` parses actual WAV/AIFF/AU (PCM) headers via
  * javax.sound.sampled. Video remains the one stubbed modality
  * (`StubCodec` — the JDK ships no video codec): the stub derives
  * deterministic "decoded" properties from byte content alone, so the
  * Spark-side plumbing (schema, per-partition batching, partition
  * sizing) stays real and testable end-to-end while that codec is
  * swappable.
  *
  * Scale design: decode runs per-partition over an iterator (one codec
  * init per partition, not per row — the moral equivalent of
  * mapInPandas batching); media tables should be repartitioned by
  * byte-size budget, not row count, before decode (`repartitionForMedia`).
  */
object Multimodal {

  /** Pluggable codec boundary. A real deployment binds JNI/FFI codecs
    * here; batch-oriented so implementations amortize init. */
  trait MediaCodec extends Serializable {
    def decodeBatch(blobs: Iterator[Array[Byte]]): Iterator[MediaMeta]
  }

  final case class MediaMeta(nBytes: Long, width: Int, height: Int, frames: Int)

  /** Deterministic stand-in: properties derived from byte length.
    * (A real codec parses headers; same shape, same plumbing.) */
  object StubCodec extends MediaCodec {
    def decodeBatch(blobs: Iterator[Array[Byte]]): Iterator[MediaMeta] =
      blobs.map { b =>
        val n = b.length.toLong
        MediaMeta(n, (n % 640 + 16).toInt, (n % 480 + 16).toInt, (n % 30 + 1).toInt)
      }
  }

  /** REAL image codec on the JDK's dependency-free `javax.imageio`:
    * parses actual JPEG/PNG/GIF/BMP headers and pixels. Images are
    * single-frame. Unreadable/non-image blobs decode to (-1, -1, 0)
    * instead of failing the batch — at 100 TB corrupt rows are data to
    * route, not task-killing errors. */
  object ImageIoCodec extends MediaCodec {
    def decodeBatch(blobs: Iterator[Array[Byte]]): Iterator[MediaMeta] =
      blobs.map { b =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null) MediaMeta(b.length.toLong, -1, -1, 0)
          else MediaMeta(b.length.toLong, img.getWidth, img.getHeight, 1)
        } catch { case _: Exception => MediaMeta(b.length.toLong, -1, -1, 0) }
      }
  }

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("frames", IntegerType)))

  /** Per-partition batch decode: (idCol, blobCol) → decoded metadata. */
  def decode(df: DataFrame, idCol: String, blobCol: String,
             codec: MediaCodec = StubCodec): DataFrame = {
    val spark = df.sparkSession
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    val rowEnc = ExpressionEncoder(decodedSchema)
    input.mapPartitions { rows =>
      // one codec session per partition; decode streams through it
      val buffered = rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      val (ids, blobs) = buffered.duplicate
      ids.map(_._1).zip(codec.decodeBatch(blobs.map(_._2))).map {
        case (id, m) => Row(id, m.nBytes, m.width, m.height, m.frames)
      }
    }(rowEnc)
  }

  /** Pluggable audio codec boundary — audio metadata has its own
    * natural shape (rate/channels/frames), not the image struct. */
  trait AudioCodec extends Serializable {
    def decodeBatch(blobs: Iterator[Array[Byte]]): Iterator[AudioMeta]
  }

  final case class AudioMeta(nBytes: Long, sampleRate: Int, channels: Int, frames: Long)

  /** REAL audio codec on the JDK's dependency-free
    * `javax.sound.sampled`: parses actual WAV/AIFF/AU headers (PCM).
    * Unreadable/non-audio blobs decode to (-1, -1, 0) instead of
    * failing the batch — corrupt rows are data to route. Video remains
    * the one stubbed modality (the JDK genuinely ships no video
    * codec). */
  object JavaSoundCodec extends AudioCodec {
    def decodeBatch(blobs: Iterator[Array[Byte]]): Iterator[AudioMeta] =
      blobs.map { b =>
        try {
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(b))
          try {
            val f = ais.getFormat
            AudioMeta(b.length.toLong, f.getSampleRate.toInt, f.getChannels,
              ais.getFrameLength)
          } finally ais.close()
        } catch { case _: Exception => AudioMeta(b.length.toLong, -1, -1, 0L) }
      }
  }

  val decodedAudioSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("n_bytes", LongType),
    StructField("sample_rate", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_frames", LongType)))

  /** Per-partition batch audio decode: (idCol, blobCol) → audio
    * metadata — same one-codec-session-per-partition shape as
    * [[decode]]. */
  def decodeAudio(df: DataFrame, idCol: String, blobCol: String,
                  codec: AudioCodec = JavaSoundCodec): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    val rowEnc = ExpressionEncoder(decodedAudioSchema)
    input.mapPartitions { rows =>
      val buffered = rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      val (ids, blobs) = buffered.duplicate
      ids.map(_._1).zip(codec.decodeBatch(blobs.map(_._2))).map {
        case (id, m) => Row(id, m.nBytes, m.sampleRate, m.channels, m.frames)
      }
    }(rowEnc)
  }

  /** Byte-budget repartitioning: media rows are wildly variable-sized,
    * so partition count follows total payload bytes, not row count.
    * Sized from Catalyst plan statistics (file-source size estimates),
    * NOT a data pass — at 100 TB a `sum(length(blob))` pre-scan would
    * read the whole table once just to pick a partition count. Blobs
    * dominate a media table's bytes, so the table-level estimate is
    * the right magnitude. */
  def repartitionForMedia(df: DataFrame, blobCol: String,
                          targetBytesPerPartition: Long = 128L << 20): DataFrame = {
    val totalBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val parts = (totalBytes / targetBytesPerPartition).max(1).min(1 << 20).toInt
    df.repartition(parts)
  }

  /** Frame sampling plan for video-like media: one output row per
    * sampled frame index (stride sampling) — the exploded shape a
    * feature extractor consumes. */
  def sampleFrames(decoded: DataFrame, stride: Int = 10): DataFrame =
    decoded.select(
      col("media_id"),
      explode(sequence(lit(0), greatest(col("frames") - 1, lit(0)), lit(stride)))
        .as("frame_idx"))

  /** Batch resize boundary: blob → blob at (width, height). The stub
    * derives a deterministic smaller payload (a real binding re-encodes
    * pixels); same per-partition batching as decode. */
  trait MediaResizer extends Serializable {
    def resizeBatch(blobs: Iterator[Array[Byte]], w: Int, h: Int): Iterator[Array[Byte]]
  }

  object StubResizer extends MediaResizer {
    def resizeBatch(blobs: Iterator[Array[Byte]], w: Int, h: Int): Iterator[Array[Byte]] =
      blobs.map { b =>
        // deterministic: payload shrinks proportionally to target area,
        // bounded by the original (stands in for pixel re-encoding)
        val target = math.min(b.length.toLong, math.max(1L, w.toLong * h / 64)).toInt
        java.util.Arrays.copyOf(b, target)
      }
  }

  /** REAL image resizer (javax.imageio + BufferedImage): decode,
    * area-interpolated scale to (w, h), re-encode as PNG. Unreadable
    * blobs pass through unchanged. Headless-safe: BufferedImage
    * rendering needs no display. */
  object ImageIoResizer extends MediaResizer {
    def resizeBatch(blobs: Iterator[Array[Byte]], w: Int, h: Int): Iterator[Array[Byte]] =
      blobs.map { b =>
        try {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
          if (img == null) b
          else {
            val out = new java.awt.image.BufferedImage(
              w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
            val g = out.createGraphics()
            try {
              g.setRenderingHint(
                java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, w, h, null)
            } finally g.dispose()
            val baos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(out, "png", baos)
            baos.toByteArray
          }
        } catch { case _: Exception => b }
      }
  }

  val resizedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType),
    StructField("blob", BinaryType),
    StructField("width", IntegerType),
    StructField("height", IntegerType)))

  /** Per-partition batch resize: (idCol, blobCol) → (media_id, blob,
    * width, height) at the target dimensions. */
  def resize(df: DataFrame, idCol: String, blobCol: String,
             width: Int, height: Int,
             resizer: MediaResizer = StubResizer): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    val rowEnc = ExpressionEncoder(resizedSchema)
    input.mapPartitions { rows =>
      val buffered = rows.map(r => (r.getLong(0), r.getAs[Array[Byte]](1)))
      val (ids, blobs) = buffered.duplicate
      ids.map(_._1).zip(resizer.resizeBatch(blobs.map(_._2), width, height)).map {
        case (id, b) => Row(id, b, width, height)
      }
    }(rowEnc)
  }
}
