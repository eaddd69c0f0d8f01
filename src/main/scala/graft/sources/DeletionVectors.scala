package graft.sources

/** Delta Lake deletion-vector plumbing: the three PUBLIC formats a DV
  * round-trip needs (Delta PROTOCOL.md "Deletion Vectors" + the
  * RoaringFormatSpec at github.com/RoaringBitmap/RoaringFormatSpec + the
  * ZeroMQ Z85 RFC):
  *
  *  - [[Z85]]: base85 over the Z85 alphabet, 4 bytes ↔ 5 chars, with
  *    Delta's zero-pad-then-truncate convention for arbitrary lengths.
  *  - [[RoaringBitmapArray]]: the 64-bit "portable" bitmap-of-bitmaps —
  *    [nBitmaps: i64 LE] then per bitmap [key: i32 LE][standard 32-bit
  *    roaring serialization]. Reads array, bitmap and run containers;
  *    writes array/bitmap (runs are a writer option, never required).
  *  - [[DeletionVectors]]: the DV blob (magic 1681511377 LE + portable
  *    bitmaps), the on-disk DV file layout (version byte, then per DV at
  *    its offset [size: i32 BE][blob][CRC-32: i32 BE]), and the
  *    `deletionVector` descriptor's three storage types — `i` inline
  *    (Z85 blob), `u` relative file (Z85 UUID + optional prefix),
  *    `p` absolute path.
  *
  * Scale note: a DV stays COMPRESSED (the roaring blob, ~KBs) from disk
  * to the executors; positions are only exploded inside a distributed
  * flatMap at apply time — the driver never materializes O(deleted rows).
  */
object Z85 {
  private val alphabet =
    "0123456789abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
  private val decodeMap: Array[Int] = {
    val m = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => m(c.toInt) = i }
    m
  }

  /** Encode; input is zero-padded to a multiple of 4 (Delta's Base85Codec
    * convention — the decoder truncates back to the caller's length). */
  def encode(bytes: Array[Byte]): String = {
    val padded =
      if (bytes.length % 4 == 0) bytes
      else bytes ++ Array.fill[Byte](4 - bytes.length % 4)(0)
    val sb = new StringBuilder(padded.length / 4 * 5)
    var i = 0
    while (i < padded.length) {
      var v = 0L
      var j = 0
      while (j < 4) { v = (v << 8) | (padded(i + j) & 0xffL); j += 1 }
      var div = 85L * 85 * 85 * 85
      while (div >= 1) { sb.append(alphabet(((v / div) % 85).toInt)); div /= 85 }
      i += 4
    }
    sb.toString
  }

  /** Decode to exactly `outLen` bytes (truncating the zero pad). */
  def decode(s: String, outLen: Int): Array[Byte] = {
    require(s.length % 5 == 0, s"Z85 length ${s.length} not a multiple of 5")
    val out = new Array[Byte](s.length / 5 * 4)
    var i = 0
    while (i < s.length) {
      var v = 0L
      var j = 0
      while (j < 5) {
        val c = s.charAt(i + j)
        val d = if (c < 128) decodeMap(c.toInt) else -1
        require(d >= 0, s"invalid Z85 character '$c'")
        v = v * 85 + d
        j += 1
      }
      var k = 3
      while (k >= 0) { out(i / 5 * 4 + (3 - k)) = ((v >>> (8 * k)) & 0xff).toByte; k -= 1 }
      i += 5
    }
    require(outLen <= out.length, s"requested $outLen bytes from ${out.length} decoded")
    java.util.Arrays.copyOfRange(out, 0, outLen)
  }
}

/** 64-bit roaring bitmap in the "portable" format: sorted-unique Longs
  * bucketed by their high 32 bits, each bucket a standard 32-bit roaring
  * bitmap over the low 32 bits (keyed internally by the NEXT 16 bits into
  * 16-bit containers). Only what a DV needs: build from sorted positions,
  * serialize, deserialize, iterate. */
object RoaringBitmapArray {
  private val SERIAL_COOKIE = 12347
  private val SERIAL_COOKIE_NO_RUNCONTAINER = 12346
  private val NO_OFFSET_THRESHOLD = 4

  /** Serialize sorted distinct non-negative Longs to portable bytes. */
  def serialize(sortedValues: Array[Long]): Array[Byte] = {
    require(sortedValues.forall(_ >= 0), "DV positions must be non-negative")
    val byHigh = sortedValues.groupBy(v => (v >>> 32).toInt).toSeq.sortBy(_._1)
    val bitmaps = byHigh.map { case (key, vs) =>
      (key, serialize32(vs.map(v => (v & 0xffffffffL).toInt)))
    }
    val total = 8 + bitmaps.map(b => 4 + b._2.length).sum
    val buf = java.nio.ByteBuffer.allocate(total).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putLong(bitmaps.size.toLong)
    bitmaps.foreach { case (key, bytes) => buf.putInt(key); buf.put(bytes) }
    buf.array()
  }

  /** One standard 32-bit roaring bitmap (values already sorted unique). */
  private def serialize32(values: Array[Int]): Array[Byte] = {
    val containers = values.groupBy(v => (v >>> 16) & 0xffff).toSeq.sortBy(_._1)
      .map { case (hi, vs) => (hi, vs.map(_ & 0xffff).sorted) }
    // array container ≤ 4096 values (2 bytes each), else 8 KiB bitmap
    val bodies = containers.map { case (_, lows) =>
      if (lows.length <= 4096) {
        val b = java.nio.ByteBuffer.allocate(lows.length * 2)
          .order(java.nio.ByteOrder.LITTLE_ENDIAN)
        lows.foreach(v => b.putShort(v.toShort))
        b.array()
      } else {
        val words = new Array[Long](1024)
        lows.foreach(v => words(v >>> 6) |= (1L << (v & 63)))
        val b = java.nio.ByteBuffer.allocate(8192).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        words.foreach(b.putLong)
        b.array()
      }
    }
    val n = containers.size
    val headerLen = 8 + 4 * n // cookie+size, then (key, card-1) pairs
    val offsetLen = 4 * n     // always present with the no-run cookie
    val buf = java.nio.ByteBuffer.allocate(headerLen + offsetLen + bodies.map(_.length).sum)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(SERIAL_COOKIE_NO_RUNCONTAINER)
    buf.putInt(n)
    containers.zip(bodies).foreach { case ((hi, lows), _) =>
      buf.putShort(hi.toShort); buf.putShort((lows.length - 1).toShort)
    }
    var off = headerLen + offsetLen
    bodies.foreach { b => buf.putInt(off); off += b.length }
    bodies.foreach(buf.put)
    buf.array()
  }

  /** Deserialize portable bytes back to sorted values. */
  def deserialize(bytes: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val nBitmaps = buf.getLong
    require(nBitmaps >= 0 && nBitmaps <= Int.MaxValue, s"corrupt DV: $nBitmaps bitmaps")
    val out = Array.newBuilder[Long]
    (0 until nBitmaps.toInt).foreach { _ =>
      val key = buf.getInt.toLong << 32
      deserialize32(buf).foreach(v => out += (key | (v & 0xffffffffL)))
    }
    out.result()
  }

  /** One standard 32-bit roaring bitmap, consuming from `buf` in place. */
  private def deserialize32(buf: java.nio.ByteBuffer): Array[Int] = {
    val cookie = buf.getInt
    val (n, runBitmap: Option[Array[Byte]]) =
      if ((cookie & 0xffff) == SERIAL_COOKIE) {
        val size = ((cookie >>> 16) & 0xffff) + 1
        val rb = new Array[Byte]((size + 7) / 8)
        buf.get(rb)
        (size, Some(rb))
      } else {
        require(cookie == SERIAL_COOKIE_NO_RUNCONTAINER, s"bad roaring cookie $cookie")
        (buf.getInt, None)
      }
    def isRun(i: Int) = runBitmap.exists(rb => (rb(i / 8) & (1 << (i % 8))) != 0)
    val keys = new Array[Int](n)
    val cards = new Array[Int](n)
    (0 until n).foreach { i =>
      keys(i) = buf.getShort & 0xffff
      cards(i) = (buf.getShort & 0xffff) + 1
    }
    // offset header present without runs, or with runs when size >= 4
    if (runBitmap.isEmpty || n >= NO_OFFSET_THRESHOLD)
      (0 until n).foreach(_ => buf.getInt)
    val out = Array.newBuilder[Int]
    (0 until n).foreach { i =>
      val base = keys(i) << 16
      if (isRun(i)) {
        val nRuns = buf.getShort & 0xffff
        (0 until nRuns).foreach { _ =>
          val start = buf.getShort & 0xffff
          val len = buf.getShort & 0xffff
          (start to start + len).foreach(v => out += (base | v))
        }
      } else if (cards(i) > 4096) {
        (0 until 1024).foreach { w =>
          val word = buf.getLong
          if (word != 0L) (0 until 64).foreach { b =>
            if ((word & (1L << b)) != 0L) out += (base | (w * 64 + b))
          }
        }
      } else (0 until cards(i)).foreach(_ => out += (base | (buf.getShort & 0xffff)))
    }
    out.result()
  }
}

object DeletionVectors {
  val Magic = 1681511377 // little-endian in the blob, per PROTOCOL.md

  /** The add-action descriptor (Delta PROTOCOL.md `deletionVector`). */
  case class Descriptor(storageType: String, pathOrInlineDv: String,
      offset: Option[Int], sizeInBytes: Int, cardinality: Long)

  /** DV blob = magic + portable bitmaps. */
  def toBlob(sortedPositions: Array[Long]): Array[Byte] = {
    val bm = RoaringBitmapArray.serialize(sortedPositions)
    val buf = java.nio.ByteBuffer.allocate(4 + bm.length)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.putInt(Magic); buf.put(bm)
    buf.array()
  }

  def fromBlob(blob: Array[Byte]): Array[Long] = {
    val buf = java.nio.ByteBuffer.wrap(blob).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    val magic = buf.getInt
    require(magic == Magic, s"bad DV magic $magic")
    RoaringBitmapArray.deserialize(
      java.util.Arrays.copyOfRange(blob, 4, blob.length))
  }

  private def crc32(bytes: Array[Byte]): Int = {
    val c = new java.util.zip.CRC32()
    c.update(bytes)
    c.getValue.toInt
  }

  /** Append one DV to an on-disk DV file (creating it with its version
    * byte if absent): [size: i32 BE][blob][CRC-32(blob): i32 BE] at the
    * returned offset. */
  def appendToFile(path: java.nio.file.Path, blob: Array[Byte]): Int = {
    import java.nio.file.{Files, StandardOpenOption}
    if (!Files.exists(path)) Files.write(path, Array[Byte](1))
    val offset = Files.size(path).toInt
    val buf = java.nio.ByteBuffer.allocate(4 + blob.length + 4)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    buf.putInt(blob.length); buf.put(blob); buf.putInt(crc32(blob))
    Files.write(path, buf.array(), StandardOpenOption.APPEND)
    offset
  }

  /** Read one DV blob from a DV file at the descriptor's offset,
    * verifying length and checksum. */
  def readFromFile(path: java.nio.file.Path, offset: Int, sizeInBytes: Int): Array[Byte] = {
    val all = java.nio.file.Files.readAllBytes(path)
    require(all.nonEmpty && all(0) == 1, s"unsupported DV file version ${all.headOption}")
    val buf = java.nio.ByteBuffer.wrap(all, offset, all.length - offset)
      .order(java.nio.ByteOrder.BIG_ENDIAN)
    val len = buf.getInt
    require(len == sizeInBytes,
      s"DV size mismatch at offset $offset: file says $len, descriptor says $sizeInBytes")
    val blob = new Array[Byte](len)
    buf.get(blob)
    val expected = buf.getInt
    require(crc32(blob) == expected, s"DV checksum mismatch at offset $offset")
    blob
  }

  /** [[load]] + [[fromBlob]], MEMOIZED per (tableRoot, descriptor) —
    * round-20 optimization (guide §1.2): every routed query on a
    * DV-carrying table re-read and re-decoded the same immutable blobs,
    * once per masked chunk per execution. A descriptor addresses immutable
    * blob CONTENT (inline bytes, or a file region Delta never rewrites in
    * place — DV files are append-only and a changed mask gets a new
    * descriptor), so a hit can never be stale and no version key is
    * needed: a commit that changes a file's DV changes its descriptor.
    * LRU-bounded by TOTAL expanded positions (~128 MB of longs), and the
    * routed readers only reach here under the delete-budget gate
    * ([[Lake.bucketLayoutMoR]]), which bounds any single table's
    * expansion. */
  def expandedPositions(tableRoot: String, d: Descriptor): Array[Long] = {
    val key = (tableRoot, d)
    expandCache.synchronized {
      val hit = expandCache.get(key)
      if (hit != null) return hit
    }
    val computed = fromBlob(load(tableRoot, d))
    expandCache.synchronized {
      expandCacheLongs += computed.length.toLong
      val prev = expandCache.put(key, computed) // a racing compute of the
      if (prev != null) expandCacheLongs -= prev.length.toLong // same key
      val it = expandCache.entrySet().iterator()
      while (expandCacheLongs > MaxCachedPositions && it.hasNext) {
        val e = it.next()
        if (!(e.getValue eq computed)) {
          expandCacheLongs -= e.getValue.length.toLong
          it.remove()
        }
      }
    }
    computed
  }

  private val MaxCachedPositions = 16L * 1024 * 1024 // 128 MB of longs
  private var expandCacheLongs = 0L
  private val expandCache =
    new java.util.LinkedHashMap[(String, Descriptor), Array[Long]](64, 0.75f, true)

  /** Resolve a descriptor to its blob bytes (driver-side: blobs are
    * compressed-bitmap sized, like manifests — positions stay unexploded
    * until the distributed apply). */
  def load(tableRoot: String, d: Descriptor): Array[Byte] = d.storageType match {
    case "i" => Z85.decode(d.pathOrInlineDv, d.sizeInBytes)
    case _ => readFromFile(filePath(tableRoot, d).get, d.offset.getOrElse(0), d.sizeInBytes)
  }

  /** On-disk blob path for a descriptor; None for inline ('i') DVs. The
    * path vacuum must NOT reclaim while a retained version references it. */
  def filePath(tableRoot: String, d: Descriptor): Option[java.nio.file.Path] = d.storageType match {
    case "i" => None
    case "u" =>
      // <optional prefix><20-char Z85 uuid>; file: [prefix/]deletion_vector_<uuid>.bin
      val s = d.pathOrInlineDv
      require(s.length >= 20, s"malformed 'u' DV path '$s'")
      val (prefix, encUuid) = s.splitAt(s.length - 20)
      val raw = Z85.decode(encUuid, 16)
      val bb = java.nio.ByteBuffer.wrap(raw)
      val uuid = new java.util.UUID(bb.getLong, bb.getLong)
      val dir = if (prefix.isEmpty) tableRoot.stripSuffix("/")
        else s"${tableRoot.stripSuffix("/")}/$prefix"
      Some(java.nio.file.Paths.get(dir, s"deletion_vector_$uuid.bin"))
    case "p" =>
      Some(java.nio.file.Paths.get(DeltaRead.pctDecode(d.pathOrInlineDv)
        .replaceFirst("^[a-zA-Z0-9+.-]+:(//)?", "")))
    case other => throw new IllegalArgumentException(s"unknown DV storageType '$other'")
  }
}
