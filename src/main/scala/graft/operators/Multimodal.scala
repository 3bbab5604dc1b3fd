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
  * javax.sound.sampled. VIDEO container metadata is real too:
  * `VideoContainerCodec` walks MP4/ISO-BMFF boxes and Matroska/WebM
  * EBML elements for dimensions and frame counts (both public binary
  * formats, pure JDK). Only video PIXEL decode stays stubbed
  * (`StubCodec` — the JDK ships no video codec); the stub derives
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

  /** REAL video CONTAINER metadata codec — pure-JDK parsing of the
    * two public container formats' headers (no pixel decode; the JDK
    * ships no video codec, but the container metadata a pipeline
    * filters/routes on — dimensions, frame counts — lives in plain
    * binary structures):
    *
    *  - '''MP4 / ISO BMFF''' (ISO 14496-12): box walk
    *    `moov → trak → {tkhd, mdia/hdlr, mdia/minf/stbl/stsz}` —
    *    width/height from the video (`hdlr = 'vide'`) track's `tkhd`
    *    16.16 fixed-point fields, frame count from its `stsz`
    *    sample_count.
    *  - '''Matroska / WebM''' (public EBML spec): vint-ID element walk
    *    `Segment → Tracks → TrackEntry(TrackType=1) → Video →
    *    {PixelWidth, PixelHeight}`. Frame count is not in the
    *    container header (it would need a cluster scan), so frames=0.
    *
    * Unreadable/non-video blobs decode to (-1, -1, 0) like the other
    * real codecs — corrupt rows are data to route, not task killers. */
  object VideoContainerCodec extends MediaCodec {
    def decodeBatch(blobs: Iterator[Array[Byte]]): Iterator[MediaMeta] =
      blobs.map { b =>
        try {
          if (isMp4(b)) parseMp4(b)
          else if (isEbml(b)) parseMkv(b)
          else MediaMeta(b.length.toLong, -1, -1, 0)
        } catch { case _: Exception => MediaMeta(b.length.toLong, -1, -1, 0) }
      }

    private def isMp4(b: Array[Byte]): Boolean =
      b.length >= 8 && b(4) == 'f' && b(5) == 't' && b(6) == 'y' && b(7) == 'p'

    private def isEbml(b: Array[Byte]): Boolean =
      b.length >= 4 && (b(0) & 0xff) == 0x1A && (b(1) & 0xff) == 0x45 &&
        (b(2) & 0xff) == 0xDF && (b(3) & 0xff) == 0xA3

    private def be32(b: Array[Byte], o: Int): Long =
      ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
        ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)

    /** (type, payloadStart, payloadEnd) for each box in [s, e). */
    private def mp4Boxes(b: Array[Byte], s: Int, e: Int): Seq[(String, Int, Int)] = {
      val out = Seq.newBuilder[(String, Int, Int)]
      var p = s
      while (p + 8 <= e) {
        var size = be32(b, p)
        val tpe = new String(b, p + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
        var hdr = 8
        if (size == 1 && p + 16 <= e) { // 64-bit largesize
          size = (be32(b, p + 8) << 32) | be32(b, p + 12); hdr = 16
        } else if (size == 0) size = (e - p).toLong // box runs to end
        if (size < hdr || p + size > e) return out.result() // malformed tail
        out += ((tpe, p + hdr, p + size.toInt))
        p += size.toInt
      }
      out.result()
    }

    private def mp4Find(b: Array[Byte], s: Int, e: Int, path: List[String]): Option[(Int, Int)] =
      path match {
        case Nil => Some((s, e))
        case head :: tail =>
          mp4Boxes(b, s, e).collectFirst { case (t, cs, ce) if t == head => (cs, ce) }
            .flatMap { case (cs, ce) => mp4Find(b, cs, ce, tail) }
      }

    private def parseMp4(b: Array[Byte]): MediaMeta = {
      val sentinel = MediaMeta(b.length.toLong, -1, -1, 0)
      mp4Find(b, 0, b.length, List("moov")).map { case (ms, me) =>
        val traks = mp4Boxes(b, ms, me).filter(_._1 == "trak")
        def handlerOf(ts: Int, te: Int): Option[String] =
          mp4Find(b, ts, te, List("mdia", "hdlr")).collect {
            case (hs, he) if he - hs >= 12 =>
              new String(b, hs + 8, 4, java.nio.charset.StandardCharsets.US_ASCII)
          }
        // a 'vide' track, else a track that DECLARES no handler (some
        // muxers omit hdlr) — but never a declared non-video track:
        // an audio-only .m4a must sentinel, not report its sample
        // count as video frames
        val video = traks.find { case (_, ts, te) => handlerOf(ts, te).contains("vide") }
          .orElse(traks.find { case (_, ts, te) => handlerOf(ts, te).isEmpty })
        video.flatMap { case (_, ts, te) =>
          mp4Find(b, ts, te, List("tkhd")).map { case (ks, ke) =>
            val v = b(ks) & 0xff
            val off = ks + 4 + (if (v == 1) 32 else 20) + 52
            val (w, h) =
              if (off + 8 <= ke) ((be32(b, off) >> 16).toInt, (be32(b, off + 4) >> 16).toInt)
              else (-1, -1)
            val frames = mp4Find(b, ts, te, List("mdia", "minf", "stbl", "stsz"))
              .collect { case (zs, ze) if ze - zs >= 12 => be32(b, zs + 8).toInt }
              .getOrElse(0)
            MediaMeta(b.length.toLong, w, h, frames)
          }
        }.getOrElse(sentinel)
      }.getOrElse(sentinel)
    }

    /** EBML vint at `p`: (value, widthBytes). `keepMarker` keeps the
      * length-marker bit (element IDs) or masks it (sizes). */
    private def vint(b: Array[Byte], p: Int, keepMarker: Boolean): (Long, Int) = {
      val first = b(p) & 0xff
      require(first != 0, "invalid EBML vint")
      val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
      var v = (if (keepMarker) first else first & (0xff >>> len)).toLong
      var i = 1
      while (i < len) { v = (v << 8) | (b(p + i) & 0xff); i += 1 }
      (v, len)
    }

    /** (id, payloadStart, payloadEnd) for each EBML element in [s, e). */
    private def ebmlChildren(b: Array[Byte], s: Int, e: Int): Seq[(Long, Int, Int)] = {
      val out = Seq.newBuilder[(Long, Int, Int)]
      var p = s
      while (p < e) {
        val (id, idw) = vint(b, p, keepMarker = true)
        val (sz, szw) = vint(b, p + idw, keepMarker = false)
        val ps = p + idw + szw
        // unknown-size element (all value bits set) runs to region end
        val unknownSize = sz == (1L << (7 * szw)) - 1
        val pe = if (unknownSize) e else ps + sz.toInt
        if (pe > e) return out.result()
        out += ((id, ps, pe))
        p = pe
      }
      out.result()
    }

    private def ebmlUint(b: Array[Byte], s: Int, e: Int): Long = {
      var v = 0L
      var i = s
      while (i < e) { v = (v << 8) | (b(i) & 0xff); i += 1 }
      v
    }

    private def parseMkv(b: Array[Byte]): MediaMeta = {
      val sentinel = MediaMeta(b.length.toLong, -1, -1, 0)
      val segment = ebmlChildren(b, 0, b.length)
        .collectFirst { case (0x18538067L, s, e) => (s, e) }
      segment.flatMap { case (ss, se) =>
        ebmlChildren(b, ss, se).collectFirst { case (0x1654AE6BL, s, e) => (s, e) }
      }.flatMap { case (ts, te) =>
        val entries = ebmlChildren(b, ts, te).filter(_._1 == 0xAEL)
        val video = entries.find { case (_, s, e) =>
          ebmlChildren(b, s, e).exists { case (id, vs, ve) =>
            id == 0x83L && ebmlUint(b, vs, ve) == 1L // TrackType video
          }
        }.orElse(entries.headOption)
        video.flatMap { case (_, s, e) =>
          ebmlChildren(b, s, e).collectFirst { case (0xE0L, vs, ve) =>
            val kids = ebmlChildren(b, vs, ve)
            val w = kids.collectFirst { case (0xB0L, a, z) => ebmlUint(b, a, z).toInt }
            val h = kids.collectFirst { case (0xBAL, a, z) => ebmlUint(b, a, z).toInt }
            MediaMeta(b.length.toLong, w.getOrElse(-1), h.getOrElse(-1), 0)
          }
        }
      }.getOrElse(sentinel)
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

  /** Aspect-ratio bucketing — the vision-training batch-prep step
    * (SDXL-style): every decodable image is assigned to the bucket
    * whose aspect ratio `bw:bh` is nearest its own `w:h`, so batches
    * can be formed without mixed aspect ratios. Nearness is the
    * EXACT rational `|w·bh − bw·h| / bh` (the common `1/h` factor
    * cancels across buckets), compared by long cross-multiplication
    * — no floating point, so assignment is deterministic on any
    * platform and the DuckDB oracle replays it bit-for-bit. Ties
    * keep the earliest bucket in the caller's list. Undecodable
    * blobs (width/height ≤ 0) are dropped.
    *
    * Scale shape: decode is the per-partition batched codec pass
    * (one codec session per partition, no shuffle); the argmin is a
    * folded codegen `when` chain over the bucket list (pure
    * projection); the bucket-dimension attach is a broadcast join
    * with the `buckets.size`-row table. Zero exchanges end-to-end.
    * Bucket dims ≤ 65536 and image dims < 2^20 keep every
    * cross-multiplication inside a long. */
  def aspectBucket(df: DataFrame, idCol: String, blobCol: String,
                   buckets: Seq[(Int, Int)],
                   codec: MediaCodec = StubCodec): DataFrame = {
    require(buckets.nonEmpty, "empty bucket list")
    require(buckets.forall { case (w, h) =>
      w > 0 && h > 0 && w <= 65536 && h <= 65536 },
      s"bucket dims must be in (0, 65536]: $buckets")
    val spark = df.sparkSession
    val dec = decode(df, idCol, blobCol, codec)
      .filter(col("width") > 0 && col("height") > 0 &&
        col("width") < (1 << 20) && col("height") < (1 << 20))
    val costs = buckets.map { case (bw, bh) =>
      (abs(col("width").cast("long") * bh - lit(bw.toLong) * col("height")),
        bh.toLong)
    }
    val (bi, _, _) = costs.zipWithIndex.drop(1)
      .foldLeft((lit(0), costs.head._1, lit(costs.head._2))) {
        case ((i0, n0, d0), ((n, d), i)) =>
          val better = n * d0 < n0 * lit(d)
          (when(better, lit(i)).otherwise(i0),
            when(better, n).otherwise(n0),
            when(better, lit(d)).otherwise(d0))
      }
    import spark.implicits._
    val bdf = buckets.zipWithIndex
      .map { case ((w, h), i) => (i, w, h) }
      .toDF("bucket", "bucket_w", "bucket_h")
    dec.withColumn("bucket", bi)
      .join(broadcast(bdf), "bucket")
      .select(col("media_id"), col("width"), col("height"),
        col("bucket"), col("bucket_w"), col("bucket_h"))
  }

  // ---- perceptual hashing (image near-dup dedup) ----

  /** 64-bit difference hash (dHash) of a decoded pixel matrix:
    * integer-luma grayscale is averaged over a 9×8 integer-grid
    * block downscale; bit (row·8+col) is set when the right cell's
    * mean exceeds the left's. Images smaller than 9×8 have empty
    * blocks → None. Pure integer arithmetic: deterministic for a
    * given pixel matrix on any platform. */
  private[graft] def dhashOfPixels(gray: (Int, Int) => Int,
                                   w: Int, h: Int): Option[Long] = {
    if (w < 9 || h < 8) return None
    val means = Array.ofDim[Long](8, 9)
    var cy = 0
    while (cy < 8) {
      var cx = 0
      while (cx < 9) {
        val x0 = cx * w / 9; val x1 = (cx + 1) * w / 9
        val y0 = cy * h / 8; val y1 = (cy + 1) * h / 8
        var s = 0L; var n = 0L
        var y = y0
        while (y < y1) {
          var x = x0
          while (x < x1) { s += gray(x, y); n += 1; x += 1 }
          y += 1
        }
        means(cy)(cx) = s / n
        cx += 1
      }
      cy += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) {
      if (means(k / 8)(k % 8 + 1) > means(k / 8)(k % 8)) bits |= 1L << k
      k += 1
    }
    Some(bits)
  }

  /** 1-D difference hash of a value series: 65 windows on the integer
    * grid, per-window integer mean, bit k set when window k+1's mean
    * exceeds window k's. Series shorter than 65 → None. The audio
    * fingerprint runs this over the |mono sample| energy series. */
  private[graft] def dhashOfSeries(v: Int => Long, n: Int): Option[Long] = {
    if (n < 65) return None
    val means = new Array[Long](65)
    var j = 0
    while (j < 65) {
      val a = j * n / 65; val b = (j + 1) * n / 65
      var s = 0L; var i = a
      while (i < b) { s += v(i); i += 1 }
      means(j) = s / (b - a)
      j += 1
    }
    var bits = 0L
    var k = 0
    while (k < 64) { if (means(k + 1) > means(k)) bits |= 1L << k; k += 1 }
    Some(bits)
  }

  /** Per-clip 64-bit audio fingerprint over a binary blob column —
    * the audio near-dup signal: a difference hash of the energy
    * envelope (|mono|, 65 integer-grid windows). Decode is the REAL
    * javax.sound path (WAV/AIFF/AU, 16-bit signed PCM); identical
    * samples fingerprint identically regardless of container or
    * endianness. Non-PCM/undecodable blobs and clips under 65 frames
    * yield NULL. Pure mapPartitions projection — NO shuffle; pair
    * generation is [[Dedup.hammingPairs]]. */
  def audioFingerprint(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    val enc = ExpressionEncoder(StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("afp", LongType, nullable = true))))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val fp: Option[Long] =
          try {
            import javax.sound.sampled._
            val ais = AudioSystem.getAudioInputStream(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            val fmt = ais.getFormat
            if (fmt.getSampleSizeInBits != 16 ||
                fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED) None
            else {
              val bytes = ais.readAllBytes()
              val ch = fmt.getChannels
              val be = fmt.isBigEndian
              val frameSize = fmt.getFrameSize
              val n = bytes.length / frameSize
              def mono(i: Int): Long = {
                var s = 0L; var c = 0
                while (c < ch) {
                  val o = i * frameSize + 2 * c
                  val (b0, b1) = (bytes(o), bytes(o + 1))
                  s += (if (be) ((b0 & 0xFF) << 8) | (b1 & 0xFF)
                        else ((b1 & 0xFF) << 8) | (b0 & 0xFF)).toShort
                  c += 1
                }
                s / ch
              }
              dhashOfSeries(i => math.abs(mono(i)), n)
            }
          } catch { case scala.util.control.NonFatal(_) => None }
        Row(id, fp.map(Long.box).orNull)
      }
    }(enc)
  }

  /** Integer luma of a packed ARGB pixel: (299r + 587g + 114b)/1000 —
    * the ITU-R 601 weights in exact integer arithmetic. */
  private[operators] def luma(argb: Int): Int = {
    val r = (argb >> 16) & 0xFF; val g = (argb >> 8) & 0xFF; val b = argb & 0xFF
    (299 * r + 587 * g + 114 * b) / 1000
  }

  /** Per-image 64-bit dHash column over a binary blob column —
    * the image near-dup signal (two images within a few bits are
    * visually near-identical; crops/recompressions land nearby).
    * Decode is javax.imageio; LOSSLESS formats (PNG/BMP/GIF) hash
    * identically everywhere, JPEG hashes additionally depend on the
    * decoder's IDCT so treat them as cluster-local features.
    * Undecodable blobs and images under 9×8 yield NULL dhash —
    * corrupt rows are data to route, never task kills.
    *
    * Pure per-row projection via mapPartitions (ImageIO cannot live
    * in a codegen Expression): NO shuffle at any scale. Pair
    * generation over the result is [[Dedup.hammingPairs]] — bucketed,
    * capped, exact-verified; never all-pairs. */
  def imageDHash(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val input = df.select(col(idCol).cast("long"), col(blobCol))
    val enc = ExpressionEncoder(StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("dhash", LongType, nullable = true))))
    input.mapPartitions { rows =>
      rows.map { r =>
        val id = r.getLong(0)
        val dh: Option[Long] =
          try {
            val im = javax.imageio.ImageIO.read(
              new java.io.ByteArrayInputStream(r.getAs[Array[Byte]](1)))
            if (im == null) None
            else dhashOfPixels((x, y) => luma(im.getRGB(x, y)),
              im.getWidth, im.getHeight)
          } catch { case scala.util.control.NonFatal(_) => None }
        Row(id, dh.map(Long.box).orNull)
      }
    }(enc)
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
