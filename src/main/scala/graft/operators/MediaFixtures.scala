package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer

/** Deterministic in-memory corpus of REAL media blobs — actual
  * PNG/JPEG/GIF/BMP images (encoded by javax.imageio), actual
  * WAV/AIFF/AU PCM audio (encoded by javax.sound.sampled), actual
  * MP4/ISO-BMFF and Matroska containers (built box-by-box per the
  * public specs, same structures the reference's media path stores
  * opaquely) — plus deliberately corrupt blobs.
  *
  * This lives in main, not test, because the driver correctness gate
  * (`SparkEntry.queries("q_multimodal_real")`, run by `graft.Verify`)
  * decodes this corpus through the REAL codecs and hash-matches the
  * DECLARED metadata below: the fixtures are built to spec, the
  * codecs must recover the spec. Every field of [[Fixture]] is a
  * declared constant — nothing here runs a codec, so the oracle
  * derived from it is independent of the code under test.
  *
  * Each fixture declares the expected decode result under all four
  * pipeline paths; non-matching modalities decode to the documented
  * corrupt-row sentinels ((-1, -1, 0) — corrupt rows are data to
  * route, never task-killing errors), so the corpus also pins the
  * sentinel behavior a mixed 100 TB media table depends on.
  */
object MediaFixtures {

  /** Expected (meta1, meta2, meta3) of one decode path: images/videos
    * report (width, height, frames); audio reports (sample_rate,
    * channels, pcm_frames). */
  final case class Expect(m1: Long, m2: Long, m3: Long)

  /** One blob with its declared decode matrix. `imageResized` is the
    * expectation after `resize(…, 8, 6, ImageIoResizer)` then image
    * decode: readable images re-encode at 8×6, everything else passes
    * through and stays a non-image. */
  final case class Fixture(id: Long, kind: String, blob: Array[Byte],
      image: Expect, audio: Expect, video: Expect, imageResized: Expect)

  private val sentinel = Expect(-1, -1, 0)
  private val resized = Expect(8, 6, 1)

  // ---- image encoders (javax.imageio; deterministic solid fill) ----

  /** The standard authored pixel pattern: green = (31x + 17y) mod 255,
    * red = blue = 0. Perceptual-hash gates recompute expected values
    * from THIS closed form, independent of any encode/decode. */
  def patternGreen(x: Int, y: Int): Int = (x * 31 + y * 17) % 255

  /** Deterministic image blob: `green(x, y)` in the green channel
    * (custom functions let perceptual-hash gates plant near-dup and
    * distinct variants), encoded by javax.imageio. */
  def customImage(w: Int, h: Int, format: String,
                  green: (Int, Int) => Int = patternGreen): Array[Byte] = {
    val im = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var x = 0
    while (x < w) {
      var y = 0
      while (y < h) { im.setRGB(x, y, (green(x, y) & 0xFF) << 8); y += 1 }
      x += 1
    }
    val baos = new ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, format, baos)
    baos.toByteArray
  }

  private def img(w: Int, h: Int, format: String): Array[Byte] =
    customImage(w, h, format)

  private def imageFixture(id: Long, format: String, w: Int, h: Int): Fixture =
    Fixture(id, s"image/$format", img(w, h, format),
      image = Expect(w, h, 1), audio = sentinel, video = sentinel,
      imageResized = resized)

  // ---- audio encoders (javax.sound.sampled PCM) ----

  private def pcm(fileType: javax.sound.sampled.AudioFileFormat.Type,
                  rate: Int, channels: Int, frames: Int,
                  bigEndian: Boolean): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, bigEndian)
    val bytes = new Array[Byte](frames * fmt.getFrameSize)
    var i = 0
    while (i < bytes.length) { bytes(i) = (i % 251).toByte; i += 1 }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, baos)
    baos.toByteArray
  }

  /** PCM blob authored at the SAMPLE level: `sample(k)` is the signed
    * 16-bit value of flat sample index k (frame·channels + channel),
    * byte-packed per the target endianness — so the same sample
    * function encoded as WAV (LE) and AIFF (BE) decodes to identical
    * samples, giving perceptual-hash gates a cross-format exact dup. */
  def customPcm(fileType: javax.sound.sampled.AudioFileFormat.Type,
                rate: Int, channels: Int, frames: Int, bigEndian: Boolean,
                sample: Int => Int): Array[Byte] = {
    import javax.sound.sampled._
    val fmt = new AudioFormat(rate.toFloat, 16, channels, true, bigEndian)
    val bytes = new Array[Byte](frames * fmt.getFrameSize)
    var k = 0
    while (k < frames * channels) {
      val s = sample(k).toShort
      val o = 2 * k
      if (bigEndian) { bytes(o) = (s >> 8).toByte; bytes(o + 1) = s.toByte }
      else { bytes(o) = s.toByte; bytes(o + 1) = (s >> 8).toByte }
      k += 1
    }
    val ais = new AudioInputStream(
      new java.io.ByteArrayInputStream(bytes), fmt, frames.toLong)
    val baos = new ByteArrayOutputStream()
    AudioSystem.write(ais, fileType, baos)
    baos.toByteArray
  }

  private def audioFixture(id: Long, kind: String,
                           fileType: javax.sound.sampled.AudioFileFormat.Type,
                           rate: Int, channels: Int, frames: Int,
                           bigEndian: Boolean): Fixture =
    Fixture(id, kind, pcm(fileType, rate, channels, frames, bigEndian),
      image = sentinel, audio = Expect(rate, channels, frames),
      video = sentinel, imageResized = sentinel)

  // ---- video containers (ISO 14496-12 boxes / Matroska EBML) ----

  private def be32(v: Long): Array[Byte] =
    ByteBuffer.allocate(4).putInt(v.toInt).array()

  private def box(tpe: String, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    be32(8L + body.length) ++ tpe.getBytes("US-ASCII") ++ body
  }

  /** Minimal playable-structure MP4: ftyp + moov(trak(tkhd[w,h] +
    * mdia(hdlr[handler] + minf(stbl(stsz[frames]))))). */
  private def mp4(w: Int, h: Int, frames: Int, handler: String,
                  brand: String): Array[Byte] = {
    val tkhd = box("tkhd",
      new Array[Byte](4 + 20 + 52), // v0 flags + times/ids + matrix etc.
      be32(w.toLong << 16), be32(h.toLong << 16)) // 16.16 fixed point
    val hdlr = box("hdlr", new Array[Byte](8),
      handler.getBytes("US-ASCII"), new Array[Byte](13))
    val stsz = box("stsz", new Array[Byte](4), be32(0), be32(frames.toLong))
    box("ftyp", brand.getBytes("US-ASCII"), new Array[Byte](4)) ++
      box("moov", box("trak", tkhd,
        box("mdia", hdlr, box("minf", box("stbl", stsz)))))
  }

  private def ebmlEl(id: Array[Byte], payload: Array[Byte]*): Array[Byte] = {
    val body = payload.flatten.toArray
    require(body.length < 127, "fixture elements use 1-byte sizes")
    id ++ Array((0x80 | body.length).toByte) ++ body
  }

  /** Minimal Matroska: EBML header + Segment(Tracks(TrackEntry(
    * TrackType=1, Video(PixelWidth, PixelHeight)))). Frame counts are
    * not in Matroska headers → frames = 0 by contract. */
  private def mkv(w: Int, h: Int): Array[Byte] = {
    def uint(v: Int): Array[Byte] =
      if (v < 256) Array(v.toByte)
      else Array((v >> 8).toByte, (v & 0xff).toByte)
    val id1 = (b: Int) => Array(b.toByte)
    val video = ebmlEl(id1(0xE0),
      ebmlEl(id1(0xB0), uint(w)), ebmlEl(id1(0xBA), uint(h)))
    val entry = ebmlEl(id1(0xAE), ebmlEl(id1(0x83), Array(1.toByte)), video)
    ebmlEl(be32(0x1A45DFA3L)) ++
      ebmlEl(be32(0x18538067L), ebmlEl(be32(0x1654AE6BL), entry))
  }

  private def videoFixture(id: Long, kind: String, blob: Array[Byte],
                           expect: Expect): Fixture =
    Fixture(id, kind, blob,
      image = sentinel, audio = sentinel, video = expect,
      imageResized = sentinel)

  // ---- the corpus ----

  /** 18 fixtures × 4 decode paths = 72 declared expectations. */
  lazy val all: Seq[Fixture] = Seq(
    imageFixture(1, "png", 20, 12),
    imageFixture(2, "png", 640, 360),
    imageFixture(3, "png", 1, 1),
    imageFixture(4, "jpg", 33, 7),
    imageFixture(5, "jpg", 128, 96),
    imageFixture(6, "gif", 16, 16),
    imageFixture(7, "bmp", 24, 18),
    audioFixture(8, "audio/wav", javax.sound.sampled.AudioFileFormat.Type.WAVE,
      rate = 16000, channels = 1, frames = 1600, bigEndian = false),
    audioFixture(9, "audio/wav", javax.sound.sampled.AudioFileFormat.Type.WAVE,
      rate = 44100, channels = 2, frames = 4410, bigEndian = false),
    audioFixture(10, "audio/wav", javax.sound.sampled.AudioFileFormat.Type.WAVE,
      rate = 8000, channels = 1, frames = 1, bigEndian = false),
    audioFixture(11, "audio/aiff", javax.sound.sampled.AudioFileFormat.Type.AIFF,
      rate = 22050, channels = 1, frames = 2205, bigEndian = true),
    audioFixture(12, "audio/au", javax.sound.sampled.AudioFileFormat.Type.AU,
      rate = 8000, channels = 2, frames = 800, bigEndian = true),
    videoFixture(13, "video/mp4", mp4(640, 360, 42, "vide", "isom"),
      Expect(640, 360, 42)),
    videoFixture(14, "video/mp4", mp4(1920, 1080, 100, "vide", "isom"),
      Expect(1920, 1080, 100)),
    videoFixture(15, "video/mkv", mkv(1280, 720), Expect(1280, 720, 0)),
    // audio-only MP4 (hdlr 'soun'): the video codec must sentinel it,
    // never report its audio sample count as video frames
    videoFixture(16, "audio/m4a", mp4(640, 360, 440000, "soun", "M4A "),
      sentinel),
    Fixture(17, "corrupt/text",
      "definitely not a media file, just bytes".getBytes("UTF-8"),
      sentinel, sentinel, sentinel, sentinel),
    Fixture(18, "corrupt/empty", Array.emptyByteArray,
      sentinel, sentinel, sentinel, sentinel)
  )
}
