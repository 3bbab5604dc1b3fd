package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream, File, FileOutputStream}
import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Writer of Apache Druid v9 binary segments — the scan-relevant
  * subset of the format (including roaring bitmap indexes on string
  * dimension columns), used to generate
  * ground-truth fixtures for column shapes the checked-in reference
  * segment (druid-mr/src/test/resources/test-segment) does not
  * contain: DOUBLE metric columns and multi-value string dims. The
  * fixtures drive both ScalaTest specs and the driver's oracle-checked
  * q_druid_deepstore query, closing the loop on the binary decoder:
  * what this writes, DruidSegmentReader must read back exactly.
  *
  * Emits the documented public layout (same format notes as
  * DruidSegmentReader's scaladoc): smoosh container, GenericIndexed
  * v1, LZ4-block-compressed suppliers, dictionary-encoded string
  * columns with V3 ColumnarMultiInts for multi-value dims, and a
  * segment-level `descriptor.json` in the shape Druid deep storage
  * uses (see the reference fixture's own descriptor.json).
  *
  * Deliberately exercises multi-chunk suppliers: `sizePer` is tiny so
  * every column spans several LZ4 chunks.
  */
object DruidSegmentWriter {

  /** Bump on ANY output-layout change (v2 = roaring bitmap regions on
    * string dim columns, round 7). Cached fixture directories key on
    * this so a sentinel-guarded fixture written by an older writer is
    * rebuilt instead of silently reused — without it, the round that
    * added bitmap regions would have kept testing bitmap-less bytes. */
  val FormatVersion = 2

  sealed trait Col { def name: String }
  final case class StrDim(name: String, rows: Seq[String]) extends Col
  final case class MvDim(name: String, rows: Seq[Seq[String]]) extends Col
  final case class LongMet(name: String, rows: Seq[Long]) extends Col
  final case class FloatMet(name: String, rows: Seq[Float]) extends Col
  final case class DoubleMet(name: String, rows: Seq[Double]) extends Col
  final case class ComplexMet(name: String, typeName: String, rows: Seq[Array[Byte]]) extends Col

  /** Values per compressed chunk for FIXTURES: tiny so every column
    * spans several LZ4 chunks and the reader's chunk walk gets real
    * coverage. Production writes (the DSv2 write path) pass a real
    * `sizePer` — a 2-value chunk would explode chunk-index overhead
    * and kill decode throughput at segment scale. */
  private val FixtureSizePer = 2

  /** Write a complete segment dir (descriptor.json + index.zip). */
  def write(dir: File, dataSource: String, times: Seq[Long], cols: Seq[Col],
            intervalStartMs: Long, intervalEndMs: Long,
            version: String = "2020-01-01T00:00:00.000Z",
            shardNum: Int = 0, numShards: Int = 1,
            sizePer: Int = FixtureSizePer): Unit = {
    require(sizePer >= 1, s"sizePer must be positive, got $sizePer")
    require(cols.forall(c => rowCount(c) == times.size), "all columns need times.size rows")
    // the Druid segment contract every reader fast path assumes: all
    // rows lie within the declared interval (real Druid guarantees
    // this by construction). A violating row would be dropped by the
    // window clip but COUNTED by the full-coverage aggregate shortcut
    // (aggregateWindow reads the supplier-header row count when the
    // window covers the declared interval) — fail at write, not split
    // behavior at read.
    require(times.forall(t => t >= intervalStartMs && t < intervalEndMs),
      s"segment rows must lie within the declared interval " +
        s"[$intervalStartMs, $intervalEndMs)")
    dir.mkdirs()

    // Druid's other segment contract: rows are STORED sorted by __time
    // ascending (IncrementalIndex persists time-ordered; the scan's
    // SupportsReportOrdering and the window-clip early paths rely on
    // it). Sort at write like Druid's ingestion does — stable, so
    // equal-time rows keep their input order.
    val presorted = times.indices.forall(i => i == 0 || times(i - 1) <= times(i))
    val perm: Seq[Int] = if (presorted) times.indices else times.indices.sortBy(times)
    def re[T](rows: Seq[T]): Seq[T] = if (presorted) rows else perm.map(rows)
    val sortedTimes = re(times)
    val sortedCols = if (presorted) cols else cols.map {
      case StrDim(n, rows) => StrDim(n, re(rows))
      case MvDim(n, rows) => MvDim(n, re(rows))
      case LongMet(n, rows) => LongMet(n, re(rows))
      case FloatMet(n, rows) => FloatMet(n, re(rows))
      case DoubleMet(n, rows) => DoubleMet(n, re(rows))
      case ComplexMet(n, t, rows) => ComplexMet(n, t, re(rows))
    }

    val dims = cols.collect { case d: StrDim => d.name; case d: MvDim => d.name }
    val mets = cols.filter(c => !dims.contains(c.name)).map(_.name)

    val internal = scala.collection.mutable.LinkedHashMap[String, Array[Byte]]()
    internal("index.drd") = indexDrd(dims ++ mets, dims, times.min, times.max)
    internal("__time") = columnFile("""{"valueType":"LONG","hasMultipleValues":false}""",
      longsSupplier(sortedTimes, sizePer))
    sortedCols.foreach {
      case StrDim(n, rows) => internal(n) = columnFile(
        """{"valueType":"STRING","hasMultipleValues":false}""", svStringColumn(rows, sizePer))
      case MvDim(n, rows) => internal(n) = columnFile(
        """{"valueType":"STRING","hasMultipleValues":true}""", mvStringColumn(rows, sizePer))
      case LongMet(n, rows) => internal(n) = columnFile(
        """{"valueType":"LONG","hasMultipleValues":false}""", longsSupplier(rows, sizePer))
      case FloatMet(n, rows) => internal(n) = columnFile(
        """{"valueType":"FLOAT","hasMultipleValues":false}""", floatsSupplier(rows, sizePer))
      case DoubleMet(n, rows) => internal(n) = columnFile(
        """{"valueType":"DOUBLE","hasMultipleValues":false}""", doublesSupplier(rows, sizePer))
      case ComplexMet(n, t, rows) => internal(n) = columnFile(
        s"""{"valueType":"COMPLEX","complexType":"$t","hasMultipleValues":false}""",
        genericIndexed(rows))
    }

    // smoosh container: every internal file in one chunk
    val chunk = new ByteArrayOutputStream()
    val meta = new StringBuilder("v1,2147483647,1\n")
    internal.foreach { case (name, bytes) =>
      val start = chunk.size()
      chunk.write(bytes)
      meta.append(s"$name,0,$start,${chunk.size()}\n")
    }
    val versionBin = ByteBuffer.allocate(4).putInt(9).array()

    val zip = new ZipOutputStream(new FileOutputStream(new File(dir, "index.zip")))
    try {
      def entry(name: String, bytes: Array[Byte]): Unit = {
        zip.putNextEntry(new ZipEntry(name)); zip.write(bytes); zip.closeEntry()
      }
      entry("version.bin", versionBin)
      entry("meta.smoosh", meta.toString.getBytes(StandardCharsets.UTF_8))
      entry("00000.smoosh", chunk.toByteArray)
    } finally zip.close()

    val iso = (ms: Long) => java.time.Instant.ofEpochMilli(ms).toString
    val shardJson =
      if (numShards == 1) """{"type":"none"}"""
      else s"""{"type":"numbered","partitionNum":$shardNum,"partitions":$numShards}"""
    val descriptor =
      s"""{"binaryVersion":9,"dataSource":"$dataSource",
         |"dimensions":"${dims.mkString(",")}","metrics":"${mets.mkString(",")}",
         |"interval":"${iso(intervalStartMs)}/${iso(intervalEndMs)}",
         |"version":"$version","shardSpec":$shardJson,
         |"loadSpec":{"type":"local","path":"${dir.getAbsolutePath}/index.zip"},
         |"identifier":"${dataSource}_${iso(intervalStartMs)}_${iso(intervalEndMs)}_$version",
         |"size":4096}""".stripMargin
    val out = new FileOutputStream(new File(dir, "descriptor.json"))
    try out.write(descriptor.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  private def rowCount(c: Col): Int = c match {
    case StrDim(_, r) => r.size
    case MvDim(_, r) => r.size
    case LongMet(_, r) => r.size
    case FloatMet(_, r) => r.size
    case DoubleMet(_, r) => r.size
    case ComplexMet(_, _, r) => r.size
  }

  // ---- binary writers (mirror the format notes in DruidSegmentReader) ----

  private def columnFile(descriptorJson: String, parts: Array[Byte]): Array[Byte] = {
    val json = descriptorJson.getBytes(StandardCharsets.UTF_8)
    val out = ByteBuffer.allocate(4 + json.length + parts.length)
    out.putInt(json.length).put(json).put(parts)
    out.array()
  }

  private def indexDrd(allCols: Seq[String], dims: Seq[String],
                       minTime: Long, maxTime: Long): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val d = new DataOutputStream(bos)
    d.write(genericIndexed(allCols.map(_.getBytes(StandardCharsets.UTF_8))))
    d.write(genericIndexed(dims.map(_.getBytes(StandardCharsets.UTF_8))))
    d.writeLong(minTime) // trailing metadata the reader skips
    d.writeLong(maxTime)
    val bitmap = """{"type":"roaring"}""".getBytes(StandardCharsets.UTF_8)
    d.writeInt(bitmap.length); d.write(bitmap)
    bos.toByteArray
  }

  /** GenericIndexed v1: version, allowReverseLookup, totalBytes(BE),
    * count(BE), end-offsets relative to the values region, values each
    * 4BE-length-prefixed. */
  private def genericIndexed(values: Seq[Array[Byte]]): Array[Byte] = {
    val valuesBytes = values.map(v => 4 + v.length)
    val totalBytes = 4 + 4 * values.size + valuesBytes.sum
    val buf = ByteBuffer.allocate(2 + 4 + totalBytes)
    buf.put(1.toByte).put(1.toByte).putInt(totalBytes).putInt(values.size)
    var end = 0
    values.foreach { v => end += 4 + v.length; buf.putInt(end) }
    values.foreach { v => buf.putInt(v.length).put(v) }
    buf.array()
  }

  /** LZ4-block-compress `data` in chunks of `chunkByteSize`, wrapped
    * in a GenericIndexed (compression id 0x1). */
  private def lz4Chunks(data: Array[Byte], chunkByteSize: Int): Array[Byte] = {
    val comp = net.jpountz.lz4.LZ4Factory.fastestInstance().fastCompressor()
    val chunks = data.grouped(chunkByteSize).map(comp.compress).toSeq
    genericIndexed(chunks)
  }

  private def leBytes(n: Int, put: ByteBuffer => Unit): Array[Byte] = {
    val b = ByteBuffer.allocate(n).order(ByteOrder.LITTLE_ENDIAN)
    put(b)
    b.array()
  }

  /** Compressed supplier v2 header + LZ4 chunk index (longs/floats/
    * doubles/full-ints share the shape; vsize ints add numBytes). */
  private def supplier(totalSize: Int, sizePer: Int, body: Array[Byte],
                       width: Int, numBytes: Option[Int] = None): Array[Byte] = {
    val chunks = lz4Chunks(body, sizePer * width)
    val head = ByteBuffer.allocate(1 + numBytes.size + 4 + 4 + 1)
    head.put(2.toByte)
    numBytes.foreach(nb => head.put(nb.toByte))
    head.putInt(totalSize).putInt(sizePer).put(0x1.toByte)
    head.array() ++ chunks
  }

  private def longsSupplier(rows: Seq[Long], sizePer: Int): Array[Byte] =
    supplier(rows.size, sizePer, leBytes(rows.size * 8, b => rows.foreach(b.putLong)), 8)

  private def floatsSupplier(rows: Seq[Float], sizePer: Int): Array[Byte] =
    supplier(rows.size, sizePer, leBytes(rows.size * 4, b => rows.foreach(b.putFloat)), 4)

  private def doublesSupplier(rows: Seq[Double], sizePer: Int): Array[Byte] =
    supplier(rows.size, sizePer, leBytes(rows.size * 8, b => rows.foreach(b.putDouble)), 8)

  private def intsSupplier(rows: Seq[Int], sizePer: Int): Array[Byte] =
    supplier(rows.size, sizePer, leBytes(rows.size * 4, b => rows.foreach(b.putInt)), 4)

  /** CompressedVSizeInts: little-endian packed ints of numBytes each. */
  private def vsizeIntsSupplier(rows: Seq[Int], numBytes: Int, sizePer: Int): Array[Byte] = {
    val body = new Array[Byte](rows.size * numBytes)
    rows.zipWithIndex.foreach { case (v, i) =>
      (0 until numBytes).foreach(b => body(i * numBytes + b) = ((v >> (8 * b)) & 0xff).toByte)
    }
    supplier(rows.size, sizePer, body, numBytes, Some(numBytes))
  }

  private def dictOf(values: Seq[String]): IndexedSeq[String] =
    values.distinct.sorted.toIndexedSeq

  /** Single-value dictionary column: serde version 2, flags 0,
    * dictionary, compressed vsize row ids, then the roaring bitmap
    * index — a GenericIndexed with one serialized bitmap per
    * dictionary entry (the rows holding that value), exactly what
    * Druid's DictionaryEncodedColumnPartSerde emits and what the
    * reference's reader prunes rows with. */
  private def svStringColumn(rows: Seq[String], sizePer: Int): Array[Byte] = {
    val dict = dictOf(rows)
    val ids = rows.map(dict.indexOf)
    ByteBuffer.allocate(5).put(2.toByte).putInt(0).array() ++
      genericIndexed(dict.map(_.getBytes(StandardCharsets.UTF_8))) ++
      vsizeIntsSupplier(ids, numBytesFor(dict.size), sizePer) ++
      bitmapRegion(dict.indices.map(e => ids.zipWithIndex.collect {
        case (id, row) if id == e => row
      }))
  }

  /** Multi-value dictionary column: serde version 2, flags 0x2
    * (MULTI_VALUE_V3), dictionary, then V3 ColumnarMultiInts =
    * version 3 + compressed int end-offsets (n+1) + one compressed
    * vsize ints column of all row values concatenated, then the
    * roaring bitmap index (a row is in a value's bitmap when ANY of
    * its values matches). */
  private def mvStringColumn(rows: Seq[Seq[String]], sizePer: Int): Array[Byte] = {
    val dict = dictOf(rows.flatten)
    val flat = rows.flatten.map(dict.indexOf)
    val offsets = rows.scanLeft(0)(_ + _.size)
    ByteBuffer.allocate(5).put(2.toByte).putInt(0x2).array() ++
      genericIndexed(dict.map(_.getBytes(StandardCharsets.UTF_8))) ++
      Array(3.toByte) ++
      intsSupplier(offsets, sizePer) ++
      vsizeIntsSupplier(flat, numBytesFor(dict.size), sizePer) ++
      bitmapRegion(dict.indices.map(e => rows.zipWithIndex.collect {
        case (vs, row) if vs.exists(v => dict.indexOf(v) == e) => row
      }))
  }

  /** GenericIndexed of standard-portable-format serialized
    * RoaringBitmaps, one per dictionary entry — Druid's roaring
    * bitmapSerdeFactory layout (the `{"type":"roaring"}` declared in
    * index.drd). */
  private def bitmapRegion(rowsPerEntry: Seq[Seq[Int]]): Array[Byte] =
    genericIndexed(rowsPerEntry.map { rows =>
      val b = new org.roaringbitmap.RoaringBitmap()
      rows.foreach(b.add)
      b.runOptimize()
      val buf = ByteBuffer.allocate(b.serializedSizeInBytes())
      b.serialize(buf)
      buf.array()
    })

  /** Bytes per dictionary id, sized off the MAX id (dict.size - 1), as
    * Druid's VSizeColumnarInts.getNumBytesForMax does — a 256-entry
    * dictionary has max id 255 and packs in ONE byte. Ids wider than 3
    * bytes are refused loudly instead of silently truncating.
    * (Validation caveat, documented: the MV/DOUBLE decode paths are
    * round-trip-tested against this writer; numBytes is read back from
    * the column header, so both sides stay consistent, but a segment
    * written by real Druid with >3-byte ids or non-default chunk
    * factors is outside what the fixtures cover.) */
  private def numBytesFor(dictSize: Int): Int = {
    require(dictSize <= 0x1000000,
      s"dictionary of $dictSize entries needs >3-byte ids — unsupported by this writer")
    val maxId = math.max(dictSize - 1, 0)
    if (maxId <= 0xff) 1 else if (maxId <= 0xffff) 2 else 3
  }
}
