package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def records = Multimodal.fromDocuments(spark, Tables(spark, sf001, "documents"))

  test("multimodal table carries binary payloads with typed metadata") {
    val r = records
    assert(r.schema("payload").dataType.typeName === "binary")
    assert(r.count() === 500L)
    assert(r.select("modality").distinct().as[String].collect().toSet === Set("image", "audio", "video"))
  }

  test("feature extraction is deterministic and batch-shaped") {
    val f1 = Multimodal.extractFeatures(records, dim = 8).orderBy("id").collect()
    val f2 = Multimodal.extractFeatures(records, dim = 8).orderBy("id").collect()
    assert(f1.length === 500)
    assert(f1.forall(_.feature.length === 8))
    assert(f1.map(_.feature.toSeq).toSeq === f2.map(_.feature.toSeq).toSeq)
  }

  test("metadata filters do not require payload decode (column pruning)") {
    val plan = records.toDF().where(col("modality") === "image").select("id", "width", "height")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("payload") || plan.contains("ReadSchema"), plan)
  }

  test("resize preserves aspect ratio bound and leaves small images alone") {
    val resized = Multimodal.resizeImages(records, maxSide = 64).filter(_.modality == "image").collect()
    assert(resized.forall(r => math.max(r.width, r.height) <= 64))
  }

  test("BMP build/parse round-trips dims and pixel sum (incl. row padding)") {
    // width 3 → rowSize 12 with 3 pad bytes per row: padding must be skipped
    val bmp = Containers.buildBmp24(3, 2, (x, y) => (x * 10 + y, 100 + x, 200 - y))
    val (w, h, sum) = Containers.parseBmp(bmp)
    assert((w, h) === (3, 2))
    val expect = (for { y <- 0 until 2; x <- 0 until 3 }
      yield (x * 10 + y) + (100 + x) + (200 - y)).sum.toLong
    assert(sum === expect)
  }

  test("BMP parser handles top-down (negative height) files") {
    val bmp = Containers.buildBmp24(2, 2, (x, y) => (x, y, 7))
    // flip the height field to -2 (top-down) — sum is row-order independent
    val neg = bmp.clone()
    val v = -2
    neg(22) = (v & 0xff).toByte; neg(23) = ((v >> 8) & 0xff).toByte
    neg(24) = ((v >> 16) & 0xff).toByte; neg(25) = ((v >> 24) & 0xff).toByte
    val (w, h, sum) = Containers.parseBmp(neg)
    assert((w, h) === (2, 2))
    assert(sum === Containers.parseBmp(bmp)._3)
  }

  test("WAV parser walks chunks in any order and sign-extends samples") {
    val samples = Array[Short](-32768, -1, 0, 1, 32767)
    val wav = Containers.buildWavPcm16(16000, samples)
    val (rate, n, sum) = Containers.parseWav(wav)
    assert(rate === 16000 && n === 5L)
    assert(sum === samples.map(_.toLong).sum)
    // splice an unknown odd-sized chunk between WAVE and fmt: a correct
    // parser skips it via the even-padding rule
    val junk = Array[Byte]('j', 'u', 'n', 'k', 3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = wav.take(12) ++ junk ++ wav.drop(12)
    assert(Containers.parseWav(spliced) === ((rate, n, sum)))
  }

  test("PPM parser honors whitespace/comment grammar") {
    val ppm = Containers.buildPpmP6(2, 3, (x, y) => (x, y, x + y))
    val (w, h, sum) = Containers.parsePpm(ppm)
    assert((w, h) === (2, 3))
    // same pixels, hand-written header with comments and mixed whitespace
    val pixels = ppm.drop(ppm.indexOfSlice("255\n".getBytes) + 4)
    val commented = "P6\n# a comment\n2\t3 # trailing\n255\n".getBytes("US-ASCII") ++ pixels
    assert(Containers.parsePpm(commented) === ((w, h, sum)))
  }

  test("real payload fixture decodes to the generator formulas") {
    val stats = Multimodal.decodeStats(
      Multimodal.withRealPayloads(spark, Tables(spark, sf001, "documents")))
      .collect().map(s => s.id -> s).toMap
    assert(stats.size === 500)
    val img = stats(3L) // doc_id 3: image, w=(3%8)+1=4, h=(3%6)+1=4
    assert((img.width, img.height, img.n_units) === (4, 4, 16L))
    val expected = (for { y <- 0L until 4; x <- 0L until 4 } yield
      (3 * 7 + x * 3 + y * 5) % 256 + (3 * 11 + x * 2 + y * 3) % 256 +
        (3 * 13 + x * 5 + y * 2) % 256).sum
    assert(img.sum_v === expected)
    val aud = stats(1L) // doc_id 1: audio, n=(1%50)+10=11
    assert(aud.sample_rate === 16000 && aud.n_units === 11L)
    assert(aud.sum_v === (0 until 11).map(i => ((1 * 31 + i * 7) % 65536) - 32768L).sum)
  }

  test("BMP resize really resamples pixels (nearest neighbor)") {
    // 4x2 image with distinct per-pixel values; maxSide 2 → 2x1
    val src = Containers.buildBmp24(4, 2, (x, y) => (x * 40, y * 100, 10))
    val out = Multimodal.resizeBmp(src, 2)
    val (w, h, _) = Containers.parseBmp(out)
    assert((w, h) === (2, 1))
    // target (0,0) ← source (0,0): R=0,G=0,B=10; target (1,0) ← source (2,0): R=80
    val offset = 54
    assert((out(offset) & 0xff) === 10 && (out(offset + 2) & 0xff) === 0)
    assert((out(offset + 5) & 0xff) === 80)
  }

  test("BMP resize honors top-down (negative height) row order") {
    // 2x4, G encodes logical row y*60; rows differ so a flip is detectable
    val src = Containers.buildBmp24(2, 4, (x, y) => (0, y * 60, 0))
    // top-down twin: negate height AND reverse file row order (same logical image)
    val rowSize = ((2 * 3 + 3) / 4) * 4
    val td = src.clone()
    val v = -4
    td(22) = (v & 0xff).toByte; td(23) = ((v >> 8) & 0xff).toByte
    td(24) = ((v >> 16) & 0xff).toByte; td(25) = ((v >> 24) & 0xff).toByte
    (0 until 4).foreach { fr =>
      System.arraycopy(src, 54 + (3 - fr) * rowSize, td, 54 + fr * rowSize, rowSize)
    }
    // maxSide 2 → 1x2; logical rows sampled are y=0 and y=2 (G=0, G=120)
    val a = Multimodal.resizeBmp(src, 2)
    val b = Multimodal.resizeBmp(td, 2)
    def greens(bmp: Array[Byte]): Seq[Int] = {
      val (w, h, _) = Containers.parseBmp(bmp)
      val rs = ((w * 3 + 3) / 4) * 4
      // output is bottom-up: file row r holds logical row h-1-r
      (0 until h).map(y => bmp(54 + (h - 1 - y) * rs + 1) & 0xff)
    }
    assert(greens(a) === Seq(0, 120))
    assert(greens(b) === greens(a))
  }

  test("frame sampling expands one row per sampled frame") {
    val frames = Multimodal.sampleFrames(records, everyMs = 1000)
    val perVideo = frames.groupBy("id").count()
    val expect = records.filter(_.modality == "video")
      .map(r => (r.id, math.max(1, r.duration_ms / 1000).toLong))
      .toDF("id", "expected")
    val mismatches = perVideo.join(expect, "id").where(col("count") =!= col("expected")).count()
    assert(mismatches === 0L)
  }
}
