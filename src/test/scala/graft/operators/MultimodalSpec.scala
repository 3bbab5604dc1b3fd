package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {

  private lazy val s2 = spark
  import s2.implicits._

  private def media = Seq(
    (1L, Array.fill[Byte](1000)(7)),
    (2L, Array.fill[Byte](64)(3)),
    (3L, Array.emptyByteArray)
  ).toDF("media_id", "blob")

  test("decode derives metadata per row through the batch codec") {
    val out = Multimodal.decode(media, "media_id", "blob")
      .orderBy("media_id").collect()
    assert(out.map(_.getLong(1)).toSeq == Seq(1000L, 64L, 0L))
    // stub formula: width = n % 640 + 16
    assert(out.map(_.getInt(2)).toSeq == Seq((1000 % 640 + 16), 80, 16))
  }

  test("resize emits bounded payloads at the target dimensions") {
    val out = Multimodal.resize(media, "media_id", "blob", width = 32, height = 32)
      .orderBy("media_id").collect()
    // target = min(len, 32*32/64 = 16)
    assert(out.map(_.getAs[Array[Byte]]("blob").length).toSeq == Seq(16, 16, 0))
    assert(out.forall(r => r.getInt(2) == 32 && r.getInt(3) == 32))
    // content preserved from the original prefix
    assert(out(0).getAs[Array[Byte]]("blob").forall(_ == 7))
  }

  test("frame sampling strides over decoded frame counts") {
    val decoded = Multimodal.decode(media, "media_id", "blob")
    val frames = Multimodal.sampleFrames(decoded, stride = 5)
      .groupBy("media_id").agg(count(lit(1)).as("n"), max("frame_idx").as("mx"))
      .orderBy("media_id").collect()
    // frames = n_bytes % 30 + 1; stride-5 sampling emits ceil(frames/5) rows
    val expect = Seq(1000, 64, 0).map(n => (n % 30 + 1)).map(f => (f + 4) / 5)
    assert(frames.map(_.getLong(1).toInt).toSeq == expect)
  }

  test("ImageIoCodec decodes REAL PNG/JPEG bytes; corrupt blobs don't fail the batch") {
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, rgb)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    def jpeg(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", baos)
      baos.toByteArray
    }
    val imgs = Seq(
      (1L, png(20, 12, 0xff0000)),
      (2L, jpeg(33, 7)),
      (3L, Array.fill[Byte](50)(42)) // not an image
    ).toDF("media_id", "blob")
    val out = Multimodal.decode(imgs, "media_id", "blob", Multimodal.ImageIoCodec)
      .orderBy("media_id").collect()
    assert(out(0).getInt(2) == 20 && out(0).getInt(3) == 12 && out(0).getInt(4) == 1)
    assert(out(1).getInt(2) == 33 && out(1).getInt(3) == 7)
    assert(out(2).getInt(2) == -1 && out(2).getInt(4) == 0, "corrupt blob → sentinel, not crash")
  }

  test("JavaSoundCodec decodes REAL WAV bytes; corrupt blobs don't fail the batch") {
    import javax.sound.sampled.{AudioFormat, AudioFileFormat, AudioInputStream, AudioSystem}
    def wav(rate: Float, channels: Int, nFrames: Int): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, false)
      val pcm = new Array[Byte](nFrames * fmt.getFrameSize)
      var i = 0
      while (i < pcm.length) { pcm(i) = (i % 251).toByte; i += 1 }
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, nFrames.toLong)
      val baos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, baos)
      baos.toByteArray
    }
    val audio = Seq(
      (1L, wav(16000f, 1, 1600)),   // 0.1 s of 16 kHz mono
      (2L, wav(44100f, 2, 4410)),   // 0.1 s of 44.1 kHz stereo
      (3L, Array.fill[Byte](64)(7)) // not audio
    ).toDF("media_id", "blob")
    val out = Multimodal.decodeAudio(audio, "media_id", "blob")
      .orderBy("media_id").collect()
    assert(out(0).getInt(2) == 16000 && out(0).getInt(3) == 1 && out(0).getLong(4) == 1600L)
    assert(out(1).getInt(2) == 44100 && out(1).getInt(3) == 2 && out(1).getLong(4) == 4410L)
    assert(out(2).getInt(2) == -1 && out(2).getLong(4) == 0L, "corrupt blob → sentinel, not crash")
  }

  test("ImageIoResizer re-encodes real pixels at the target size") {
    def png(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      (0 until w).foreach(x => (0 until h).foreach(y => img.setRGB(x, y, 0x00ff00)))
      val baos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", baos)
      baos.toByteArray
    }
    val imgs = Seq((1L, png(64, 48))).toDF("media_id", "blob")
    val resized = Multimodal.resize(imgs, "media_id", "blob", 8, 6,
      Multimodal.ImageIoResizer).collect()
    val back = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(resized(0).getAs[Array[Byte]]("blob")))
    assert(back.getWidth == 8 && back.getHeight == 6)
    // solid-green source stays green after bilinear resampling
    assert((back.getRGB(4, 3) & 0xffffff) == 0x00ff00)
  }

  test("VideoContainerCodec parses REAL MP4 box and Matroska EBML structures") {
    import java.nio.ByteBuffer
    def be32(v: Long): Array[Byte] = ByteBuffer.allocate(4).putInt(v.toInt).array()
    def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
    }
    // minimal ISO-BMFF: ftyp + moov(trak(tkhd + mdia(hdlr'vide' +
    // minf(stbl(stsz sample_count=42)))))
    val tkhd = box("tkhd",
      new Array[Byte](4 + 20 + 52),              // v0 + times/ids + layout
      be32(640L << 16), be32(360L << 16))        // 16.16 fixed width/height
    val hdlr = box("hdlr", new Array[Byte](8), "vide".getBytes("US-ASCII"),
      new Array[Byte](13))
    val stsz = box("stsz", new Array[Byte](4), be32(0), be32(42))
    val mp4 = box("ftyp", "isom".getBytes("US-ASCII"), new Array[Byte](4)) ++
      box("moov", box("trak", tkhd, box("mdia", hdlr, box("minf", box("stbl", stsz)))))

    // minimal Matroska: EBML header + Segment(Tracks(TrackEntry(
    // TrackType=1, Video(PixelWidth=1280, PixelHeight=720))))
    def el(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
      val body = payload.flatten.toArray
      require(body.length < 127)
      id ++ Array((0x80 | body.length).toByte) ++ body
    }
    val id1 = (b: Int) => Array(b.toByte)
    val id4 = (v: Long) => be32(v)
    val video = el(id1(0xE0),
      el(id1(0xB0), Array(0x05.toByte, 0x00.toByte)),  // 1280
      el(id1(0xBA), Array(0x02.toByte, 0xD0.toByte)))  // 720
    val entry = el(id1(0xAE), el(id1(0x83), Array(1.toByte)), video)
    val mkv = el(id4(0x1A45DFA3L)) ++
      el(id4(0x18538067L), el(id4(0x1654AE6BL), entry))

    // audio-only MP4 (hdlr 'soun'): must sentinel, not report its
    // audio sample count as video frames
    val soun = box("hdlr", new Array[Byte](8), "soun".getBytes("US-ASCII"),
      new Array[Byte](13))
    val stszAudio = box("stsz", new Array[Byte](4), be32(0), be32(440000))
    val m4a = box("ftyp", "M4A ".getBytes("US-ASCII"), new Array[Byte](4)) ++
      box("moov", box("trak", tkhd, box("mdia", soun, box("minf", box("stbl", stszAudio)))))

    val out = Multimodal.VideoContainerCodec.decodeBatch(
      Iterator(mp4, mkv, Array[Byte](1, 2, 3), Array.emptyByteArray, m4a)).toSeq
    assert(out(0) == Multimodal.MediaMeta(mp4.length.toLong, 640, 360, 42))
    assert(out(1) == Multimodal.MediaMeta(mkv.length.toLong, 1280, 720, 0))
    assert(out(2) == Multimodal.MediaMeta(3L, -1, -1, 0))
    assert(out(3) == Multimodal.MediaMeta(0L, -1, -1, 0))
    assert(out(4) == Multimodal.MediaMeta(m4a.length.toLong, -1, -1, 0),
      "audio-only MP4 must decode to the non-video sentinel")

    // and through the Spark decode plumbing
    val df = Seq((1L, mp4), (2L, mkv)).toDF("media_id", "blob")
    val got = Multimodal.decode(df, "media_id", "blob", Multimodal.VideoContainerCodec)
      .orderBy("media_id").collect()
      .map(r => (r.getInt(2), r.getInt(3), r.getInt(4))).toSeq
    assert(got == Seq((640, 360, 42), (1280, 720, 0)))
  }

  test("q_multimodal_real: the REAL-codec corpus decodes to its DECLARED metadata") {
    val got = graft.queries.PipelineQueries.multimodalReal(spark, "")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSeq
    val want = MediaFixtures.all.flatMap { f =>
      Seq(("audio", f.audio), ("image", f.image),
        ("image_resized", f.imageResized), ("video", f.video)).map {
        case (m, e) => (f.id, m, e.m1, e.m2, e.m3)
      }
    }.sortBy(r => (r._1, r._2))
    assert(got == want)
  }

  test("repartitionForMedia sizes from plan statistics without a data pass") {
    val repart = Multimodal.repartitionForMedia(media, "blob", targetBytesPerPartition = 512)
    assert(repart.rdd.getNumPartitions >= 1)
    assert(repart.count() == 3)
  }

  test("dhashOfPixels: hand-computed extremes and undersized images") {
    // 9×8 with gray = x: one pixel per block, every right neighbor
    // brighter → all 64 bits set
    assert(Multimodal.dhashOfPixels((x, _) => x, 9, 8) == Some(-1L))
    // strictly decreasing → no bit set
    assert(Multimodal.dhashOfPixels((x, _) => 9 - x, 9, 8) == Some(0L))
    // constant → ties are NOT "greater" → no bit set
    assert(Multimodal.dhashOfPixels((_, _) => 42, 90, 80) == Some(0L))
    // single flipped comparison: gray rises only from block col 0 to 1
    // on every row → bits k ≡ 0 (mod 8)
    val one = Multimodal.dhashOfPixels(
      (x, _) => if (x < 10) 0 else 50, 90, 80).get
    assert(one == (0 until 8).map(r => 1L << (8 * r)).reduce(_ | _))
    assert(Multimodal.dhashOfPixels((x, _) => x, 8, 8).isEmpty, "w < 9")
    assert(Multimodal.dhashOfPixels((x, _) => x, 9, 7).isEmpty, "h < 8")
  }

  test("imageDHash: encode→decode→hash equals the authored-pattern hash") {
    val expect = Multimodal.dhashOfPixels(
      (x, y) => 587 * MediaFixtures.patternGreen(x, y) / 1000, 72, 48).get
    val df = Seq(
      (1L, MediaFixtures.customImage(72, 48, "png")),
      (2L, MediaFixtures.customImage(72, 48, "bmp")),
      (3L, "garbage".getBytes("UTF-8")),
      (4L, MediaFixtures.customImage(4, 4, "png"))
    ).toDF("img_id", "blob")
    val got = Multimodal.imageDHash(df, "img_id", "blob").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) == Some(expect), "png round-trip")
    assert(got(2L) == Some(expect), "bmp round-trip — cross-format perceptual dup")
    assert(got(3L).isEmpty, "corrupt blob → NULL, not a task kill")
    assert(got(4L).isEmpty, "undersized image → NULL")
  }

  test("dhashOfSeries: hand-computed extremes and short series") {
    // strictly rising window means → all bits; falling → none
    assert(Multimodal.dhashOfSeries(i => i.toLong, 65) == Some(-1L))
    assert(Multimodal.dhashOfSeries(i => (65 - i).toLong, 65) == Some(0L))
    assert(Multimodal.dhashOfSeries(_ => 7L, 650) == Some(0L), "ties are not greater")
    assert(Multimodal.dhashOfSeries(i => i.toLong, 64).isEmpty, "n < 65")
  }

  test("audioFingerprint: WAV(LE) and AIFF(BE) of identical samples match the authored hash") {
    import javax.sound.sampled.AudioFileFormat.Type.{AIFF, WAVE}
    val wave: Int => Int = k => ((k % 73) - 36) * ((k / 50) % 40 + 1)
    val expect = Multimodal.dhashOfSeries(
      i => math.abs(wave(i).toShort.toLong), 4000).get
    val df = Seq(
      (1L, MediaFixtures.customPcm(WAVE, 8000, 1, 4000, bigEndian = false, wave)),
      (2L, MediaFixtures.customPcm(AIFF, 8000, 1, 4000, bigEndian = true, wave)),
      (3L, "junk".getBytes("UTF-8")),
      (4L, MediaFixtures.customPcm(WAVE, 8000, 1, 30, bigEndian = false, wave))
    ).toDF("clip_id", "blob")
    val got = Multimodal.audioFingerprint(df, "clip_id", "blob").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got(1L) == Some(expect), "wav decode")
    assert(got(2L) == Some(expect), "aiff decode — endianness-independent fingerprint")
    assert(got(3L).isEmpty && got(4L).isEmpty)
  }

  test("audioFingerprint mixes stereo to mono before the envelope") {
    import javax.sound.sampled.AudioFileFormat.Type.WAVE
    // stereo with L = 2v, R = 0 → mono v; mono with v directly must match
    val v: Int => Int = k => ((k % 61) - 30) * ((k / 40) % 30 + 1)
    val stereo = MediaFixtures.customPcm(WAVE, 8000, 2, 4000, bigEndian = false,
      k => if (k % 2 == 0) 2 * v(k / 2) else 0)
    val mono = MediaFixtures.customPcm(WAVE, 8000, 1, 4000, bigEndian = false, v)
    val df = Seq((1L, stereo), (2L, mono)).toDF("clip_id", "blob")
    val got = Multimodal.audioFingerprint(df, "clip_id", "blob").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) == got(2L))
  }

  test("aspectBucket: rational nearest aspect, tie to earliest, corrupt dropped") {
    val buckets = Seq((1, 1), (4, 3), (3, 4), (16, 9))
    val df = Seq(
      (1L, MediaFixtures.customImage(64, 64, "png")),  // exact 1:1
      (2L, MediaFixtures.customImage(80, 60, "png")),  // exact 4:3
      (3L, MediaFixtures.customImage(96, 54, "png")),  // exact 16:9
      (4L, MediaFixtures.customImage(60, 80, "png")),  // exact 3:4
      (5L, "junk".getBytes("UTF-8"))                   // undecodable
    ).toDF("media_id", "blob")
    val got = Multimodal.aspectBucket(df, "media_id", "blob", buckets,
        Multimodal.ImageIoCodec)
      .collect().map(r => r.getLong(0) -> r.getInt(3)).toMap
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 3, 4L -> 2))
    // brute-force check on a non-exact aspect: 100x70 (10:7 ≈ 1.43)
    // cost vs (1,1)=|100-70|/1=30; (4,3)=|300-280|/3≈6.67;
    // (3,4)=|400-210|/4=47.5; (16,9)=|900-1120|/9≈24.4 → bucket 1
    val one = Multimodal.aspectBucket(
      Seq((9L, MediaFixtures.customImage(100, 70, "png"))).toDF("media_id", "blob"),
      "media_id", "blob", buckets, Multimodal.ImageIoCodec).collect()
    assert(one.head.getInt(3) == 1)
    // square image with (1,1) listed twice: earliest index wins
    val tie = Multimodal.aspectBucket(
      Seq((7L, MediaFixtures.customImage(32, 32, "png"))).toDF("media_id", "blob"),
      "media_id", "blob", Seq((1, 1), (2, 2)), Multimodal.ImageIoCodec).collect()
    assert(tie.head.getInt(3) == 0)
  }

  test("aspectBucket: zero exchanges — projection + broadcast only") {
    val df = Seq((1L, MediaFixtures.customImage(16, 16, "png")))
      .toDF("media_id", "blob")
    val plan = Multimodal.aspectBucket(df, "media_id", "blob",
        Seq((1, 1), (4, 3)), Multimodal.ImageIoCodec)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("hammingPairs over stored hashes equals simhash pairing semantics") {
    import graft.operators.Dedup
    val df = Seq(
      (1L, Some(0x0L)), (2L, Some(0x3L)),          // hamming 2
      (3L, Some(0xFFL)), (4L, Some(0xFFFFFFFFL)),  // far from everything
      (5L, None: Option[Long])                     // NULL drops
    ).toDF("id", "h")
    val pairs = Dedup.hammingPairs(df, "id", "h", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(pairs.toSeq == Seq((1L, 2L, 2)))
  }
}
