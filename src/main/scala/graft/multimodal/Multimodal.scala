package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** A multimodal record: opaque binary payload + typed metadata, the column
  * layout for image/audio/video alongside text (SURVEY.md §2.10 /
  * BASELINE.json north star).
  *
  * Scale notes: payloads travel as `binary` columns (Tungsten off-heap,
  * spillable); metadata is a flat struct so filters on modality/dims prune
  * without touching payload bytes (columnar projection keeps the binary
  * column unread until a decode stage needs it).
  */
case class MultimodalRecord(
    id: Long,
    modality: String, // image | audio | video
    payload: Array[Byte],
    width: Int, // image/video
    height: Int,
    sample_rate: Int, // audio
    duration_ms: Int) // audio/video

case class MultimodalFeature(id: Long, modality: String, feature: Array[Float])

case class VideoFrame(id: Long, frame_idx: Int, frame_ts_ms: Int, frame_payload: Array[Byte])

/** Decoded payload stats: real header fields plus exact integer content
  * sums (images/frames: Σ(R+G+B) over pixels; audio: Σ signed samples) —
  * integer stats are cross-engine hash-stable, unlike channel means. */
case class DecodedStats(id: Long, modality: String, width: Int, height: Int,
    sample_rate: Int, n_units: Long, sum_v: Long)

/** Real single-file container codecs — uncompressed public formats parsed
  * with pure byte arithmetic (no codec libraries): 24-bit BI_RGB BMP
  * (BITMAPINFOHEADER), PCM 16-bit RIFF/WAVE, and binary PPM (P6). Builders
  * and parsers round-trip exactly; parsers handle the formats' real
  * obligations (BMP 4-byte row padding and bottom-up vs top-down row order,
  * RIFF chunk walking with even-byte padding, PPM whitespace/comment
  * grammar). */
object Containers {
  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def s32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) | ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)
  private def putU16(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
  }
  private def putS32(b: Array[Byte], o: Int, v: Int): Unit = {
    b(o) = (v & 0xff).toByte; b(o + 1) = ((v >> 8) & 0xff).toByte
    b(o + 2) = ((v >> 16) & 0xff).toByte; b(o + 3) = ((v >> 24) & 0xff).toByte
  }

  /** 24-bit uncompressed BMP, bottom-up rows, 4-byte row padding. */
  def buildBmp24(width: Int, height: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"bmp dims must be positive: ${width}x$height")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val data = rowSize * height
    val out = new Array[Byte](54 + data)
    out(0) = 'B'; out(1) = 'M'
    putS32(out, 2, out.length); putS32(out, 10, 54)
    putS32(out, 14, 40); putS32(out, 18, width); putS32(out, 22, height)
    putU16(out, 26, 1); putU16(out, 28, 24); putS32(out, 30, 0); putS32(out, 34, data)
    var y = 0
    while (y < height) {
      val row = 54 + (height - 1 - y) * rowSize // bottom-up: last file row is y=0
      var x = 0
      while (x < width) {
        val (r, g, b) = pix(x, y)
        out(row + x * 3) = b.toByte; out(row + x * 3 + 1) = g.toByte; out(row + x * 3 + 2) = r.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Mono PCM 16-bit little-endian RIFF/WAVE. */
  def buildWavPcm16(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putS32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putS32(out, 16, 16); putU16(out, 20, 1); putU16(out, 22, 1)
    putS32(out, 24, sampleRate); putS32(out, 28, sampleRate * 2)
    putU16(out, 32, 2); putU16(out, 34, 16)
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putS32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) { putU16(out, 44 + i * 2, samples(i) & 0xffff); i += 1 }
    out
  }

  /** Binary PPM (P6), maxval 255. */
  def buildPpmP6(width: Int, height: Int, pix: (Int, Int) => (Int, Int, Int)): Array[Byte] = {
    require(width > 0 && height > 0, s"ppm dims must be positive: ${width}x$height")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + width * height * 3)
    System.arraycopy(header, 0, out, 0, header.length)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val (r, g, b) = pix(x, y)
        val o = header.length + (y * width + x) * 3
        out(o) = r.toByte; out(o + 1) = g.toByte; out(o + 2) = b.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  /** Parse a 24-bit BMP: (width, height, Σ(R+G+B)). Honors the data offset
    * field, per-row padding, and negative-height (top-down) files. */
  def parseBmp(b: Array[Byte]): (Int, Int, Long) = {
    require(b.length >= 54 && b(0) == 'B' && b(1) == 'M', "not a BMP")
    val offset = s32(b, 10)
    val width = s32(b, 18)
    val rawHeight = s32(b, 22)
    val height = math.abs(rawHeight) // negative = top-down row order
    require(u16(b, 28) == 24, s"unsupported bpp ${u16(b, 28)} (only 24-bit)")
    require(s32(b, 30) == 0, "compressed BMP not supported")
    val rowSize = ((width * 3 + 3) / 4) * 4
    var sum = 0L
    var row = 0
    while (row < height) {
      val base = offset + row * rowSize
      var x = 0
      while (x < width) {
        // sum of B+G+R per pixel — row order (bottom-up vs top-down) cannot
        // affect a whole-image sum
        sum += (b(base + x * 3) & 0xff) + (b(base + x * 3 + 1) & 0xff) + (b(base + x * 3 + 2) & 0xff)
        x += 1
      }
      row += 1
    }
    (width, height, sum)
  }

  /** Parse RIFF/WAVE PCM-16 by walking chunks in file order (any chunk
    * order, odd sizes padded to even per RIFF): (sampleRate, nSamples,
    * Σ signed samples). */
  def parseWav(b: Array[Byte]): (Int, Long, Long) = {
    require(b.length >= 12 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E', "not a WAVE file")
    var pos = 12
    var rate = -1
    var bits = -1
    var channels = -1
    var n = 0L
    var sum = 0L
    var sawData = false
    while (pos + 8 <= b.length) {
      val id = new String(b.slice(pos, pos + 4), "US-ASCII")
      val size = s32(b, pos + 4)
      val body = pos + 8
      id match {
        case "fmt " =>
          require(u16(b, body) == 1, "only PCM wav supported")
          channels = u16(b, body + 2); rate = s32(b, body + 4); bits = u16(b, body + 14)
          require(bits == 16 && channels == 1, s"only mono 16-bit supported (got ${channels}ch/${bits}bit)")
        case "data" =>
          require(rate > 0, "data chunk before fmt chunk")
          var i = 0
          while (i + 1 < size && body + i + 1 < b.length) {
            sum += u16(b, body + i).toShort // sign-extend LE 16-bit
            n += 1; i += 2
          }
          sawData = true
        case _ => () // skip unknown chunks (LIST, fact, ...)
      }
      pos = body + size + (size & 1) // RIFF chunks pad to even length
    }
    require(sawData, "no data chunk")
    (rate, n, sum)
  }

  /** Parse binary PPM (P6) with the real header grammar — tokens separated
    * by any whitespace, `#` comments to end-of-line allowed before maxval:
    * (width, height, Σ(R+G+B)). */
  def parsePpm(b: Array[Byte]): (Int, Int, Long) = {
    require(b.length >= 2 && b(0) == 'P' && b(1) == '6', "not a P6 PPM")
    var pos = 2
    def isSpace(c: Byte) = c == ' ' || c == '\n' || c == '\r' || c == '\t'
    def nextInt(): Int = {
      while (pos < b.length && (isSpace(b(pos)) || b(pos) == '#')) {
        if (b(pos) == '#') { while (pos < b.length && b(pos) != '\n') pos += 1 }
        else pos += 1
      }
      var v = 0
      require(pos < b.length && b(pos) >= '0' && b(pos) <= '9', s"bad PPM header at $pos")
      while (pos < b.length && b(pos) >= '0' && b(pos) <= '9') { v = v * 10 + (b(pos) - '0'); pos += 1 }
      v
    }
    val width = nextInt(); val height = nextInt(); val maxval = nextInt()
    require(maxval == 255, s"only maxval 255 supported, got $maxval")
    pos += 1 // exactly one whitespace byte after maxval, then binary data
    var sum = 0L
    val end = math.min(b.length, pos + width * height * 3)
    while (pos < end) { sum += (b(pos) & 0xff); pos += 1 }
    (width, height, sum)
  }

  /** Dispatch on magic bytes: BMP → image stats, WAVE → audio stats,
    * P6 → frame stats. Returns (width, height, sampleRate, nUnits, sumV)
    * where nUnits is pixels (image/frame) or samples (audio). */
  def decode(payload: Array[Byte]): (Int, Int, Int, Long, Long) = {
    require(payload.length >= 2, "payload too short for any container")
    if (payload(0) == 'B' && payload(1) == 'M') {
      val (w, h, s) = parseBmp(payload); (w, h, 0, w.toLong * h, s)
    } else if (payload.length >= 4 && payload(0) == 'R' && payload(1) == 'I' &&
        payload(2) == 'F' && payload(3) == 'F') {
      val (rate, n, s) = parseWav(payload); (0, 0, rate, n, s)
    } else if (payload(0) == 'P' && payload(1) == '6') {
      val (w, h, s) = parsePpm(payload); (w, h, 0, w.toLong * h, s)
    } else sys.error("unknown container (expected BMP, WAVE, or P6 PPM)")
  }
}

object Multimodal {

  /** Deterministic fake FEATURE-EMBEDDING extractor (kept for payloads in
    * codecs this environment cannot decode — a real deployment swaps in a
    * model/codec here). Actual container DECODING is no longer stubbed:
    * [[decodeStats]] + [[Containers]] parse BMP/WAV/PPM for real. The fake
    * derives a reproducible float vector from the payload bytes so the
    * surrounding Spark plumbing — schema, batching, partitioning, typed
    * mapPartitions signature — is testable end-to-end for any modality.
    */
  def decodeToFeatureStub(payload: Array[Byte], dim: Int): Array[Float] = {
    val out = new Array[Float](dim)
    var h = 1125899906842597L // FNV-ish seed
    var i = 0
    while (i < payload.length) { h = h * 31 + (payload(i) & 0xff); i += 1 }
    i = 0
    while (i < dim) {
      h ^= h << 13; h ^= h >>> 7; h ^= h << 17 // xorshift
      out(i) = ((h % 2000) / 1000.0f)
      i += 1
    }
    out
  }

  /** Feature extraction over the payload column: one decode per record,
    * executed inside mapPartitions so a real codec would amortize its init
    * cost per partition (the standard batched-UDF shape). */
  def extractFeatures(records: Dataset[MultimodalRecord], dim: Int = 16): Dataset[MultimodalFeature] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      // real impl: initialize the decoder ONCE here, reuse across the batch
      it.map(r => MultimodalFeature(r.id, r.modality, decodeToFeatureStub(r.payload, dim)))
    }
  }

  /** Nearest-neighbor resample of a 24-bit BMP to fit maxSide — a REAL
    * pixel-space resize in pure byte arithmetic (source pixel for target
    * (x,y) is (x*sw/tw, y*sh/th); both sides honor bottom-up rows and
    * 4-byte padding via the shared build/parse helpers). */
  def resizeBmp(bmp: Array[Byte], maxSide: Int): Array[Byte] = {
    val (sw, sh, _) = Containers.parseBmp(bmp)
    if (math.max(sw, sh) <= maxSide) return bmp
    val scale = maxSide.toDouble / math.max(sw, sh)
    val tw = math.max(1, (sw * scale).toInt)
    val th = math.max(1, (sh * scale).toInt)
    val offset = (bmp(10) & 0xff) | ((bmp(11) & 0xff) << 8) | ((bmp(12) & 0xff) << 16) | ((bmp(13) & 0xff) << 24)
    // raw height sign picks the row order: positive = bottom-up (file row 0
    // is the BOTTOM image row), negative = top-down — resampling must honor
    // it or top-down sources come out vertically flipped
    val rawH = (bmp(22) & 0xff) | ((bmp(23) & 0xff) << 8) | ((bmp(24) & 0xff) << 16) | ((bmp(25) & 0xff) << 24)
    val topDown = rawH < 0
    val rowSize = ((sw * 3 + 3) / 4) * 4
    Containers.buildBmp24(tw, th, (x, y) => {
      val sx = x * sw / tw
      val sy = y * sh / th
      // builder hands us logical (top-down) y; map to the source's file row
      val fileRow = if (topDown) sy else sh - 1 - sy
      val base = offset + fileRow * rowSize + sx * 3
      ((bmp(base + 2) & 0xff), (bmp(base + 1) & 0xff), (bmp(base) & 0xff))
    })
  }

  /** Image resize: REAL nearest-neighbor resampling for BMP payloads (the
    * container this engine decodes natively); non-BMP image payloads keep
    * the declared stub path (payload truncation) since their codecs are
    * not available in this environment. Metadata dims always track the
    * transform. */
  def resizeImages(records: Dataset[MultimodalRecord], maxSide: Int): Dataset[MultimodalRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      if (r.modality != "image" || math.max(r.width, r.height) <= maxSide) r
      else if (r.payload.length >= 2 && r.payload(0) == 'B' && r.payload(1) == 'M') {
        val resized = resizeBmp(r.payload, maxSide)
        val (w, h, _) = Containers.parseBmp(resized)
        r.copy(payload = resized, width = w, height = h)
      } else {
        val scale = maxSide.toDouble / math.max(r.width, r.height)
        val w = math.max(1, (r.width * scale).toInt)
        val h = math.max(1, (r.height * scale).toInt)
        val stub = r.payload.take(math.max(1, (r.payload.length * scale * scale).toInt))
        r.copy(payload = stub, width = w, height = h)
      }
    }
  }

  /** Video frame sampling: one output row per sampled frame (flatMap — the
    * row-expansion plumbing is real; frame bytes are stub slices). */
  def sampleFrames(records: Dataset[MultimodalRecord], everyMs: Int): Dataset[VideoFrame] = {
    // fail at call time, not as an ArithmeticException inside an executor task
    require(everyMs > 0, s"everyMs must be positive, got $everyMs")
    import records.sparkSession.implicits._
    records.filter(_.modality == "video").flatMap { r =>
      val n = math.max(1, r.duration_ms / everyMs)
      (0 until n).iterator.map { i =>
        val ts = i * everyMs
        val slice = if (r.payload.isEmpty) r.payload
          else r.payload.slice(i % r.payload.length, math.min(r.payload.length, i % r.payload.length + 64))
        VideoFrame(r.id, i, ts, slice)
      }
    }
  }

  /** Deterministic REAL-container fixture from the documents corpus: each
    * doc_id becomes an actual parseable file — 24-bit BMP (doc_id%3==0),
    * mono 16-bit WAV (==1), or P6 PPM frame (==2) — with content derived
    * from doc_id by fixed integer formulas. Because the formulas are pure
    * integer arithmetic, the decoded channel/sample SUMS are exactly
    * expressible as batch SQL, which is what makes `t_multimodal_features`
    * oracle-checkable end-to-end against real decoding. Payload bytes are
    * built inside the typed map (executor-side, partition-parallel). */
  def withRealPayloads(spark: SparkSession, docs: DataFrame): Dataset[MultimodalRecord] = {
    import spark.implicits._
    docs.select(col("doc_id")).as[Long].map { id =>
      (id % 3) match {
        case 0 =>
          val w = (id % 8).toInt + 1; val h = (id % 6).toInt + 1
          val payload = Containers.buildBmp24(w, h, (x, y) => (
            ((id * 7 + x * 3 + y * 5) % 256).toInt,
            ((id * 11 + x * 2 + y * 3) % 256).toInt,
            ((id * 13 + x * 5 + y * 2) % 256).toInt))
          MultimodalRecord(id, "image", payload, w, h, 0, 0)
        case 1 =>
          val n = (id % 50).toInt + 10
          val samples = Array.tabulate(n)(i => (((id * 31 + i * 7) % 65536) - 32768).toShort)
          val payload = Containers.buildWavPcm16(16000, samples)
          MultimodalRecord(id, "audio", payload, 0, 0, 16000, n * 1000 / 16000)
        case _ =>
          val w = (id % 7).toInt + 1; val h = (id % 5).toInt + 1
          val payload = Containers.buildPpmP6(w, h, (x, y) => (
            ((id * 3 + x * 7 + y * 11) % 256).toInt,
            ((id * 5 + x * 11 + y * 7) % 256).toInt,
            ((id * 17 + x + y) % 256).toInt))
          MultimodalRecord(id, "video", payload, w, h, 0, 1000)
      }
    }
  }

  /** REAL decode over the payload column: parses each container with
    * [[Containers.decode]] inside mapPartitions (the batched-codec shape —
    * per-partition init cost amortized, payload bytes never shuffled). */
  def decodeStats(records: Dataset[MultimodalRecord]): Dataset[DecodedStats] = {
    import records.sparkSession.implicits._
    records.mapPartitions { it =>
      it.map { r =>
        val (w, h, rate, n, sum) = Containers.decode(r.payload)
        DecodedStats(r.id, r.modality, w, h, rate, n, sum)
      }
    }
  }

  /** Build a deterministic multimodal table from the documents corpus
    * (payload = utf-8 bytes of the text; modality round-robins) — the test
    * fixture generator, exercising the binary column path with real data. */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MultimodalRecord] = {
    import spark.implicits._
    docs.select(
        col("doc_id").as("id"),
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("modality"),
        encode(col("text"), "utf-8").as("payload"),
        (pmod(col("doc_id"), lit(640)) + 32).cast("int").as("width"),
        (pmod(col("doc_id"), lit(480)) + 32).cast("int").as("height"),
        when(pmod(col("doc_id"), lit(3)) === 1, 16000).otherwise(0).as("sample_rate"),
        when(pmod(col("doc_id"), lit(3)) =!= 0, (pmod(col("doc_id"), lit(5000)) + 1000).cast("int"))
          .otherwise(0).as("duration_ms"))
      .as[MultimodalRecord]
  }
}
