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

object Multimodal {

  /** STUB — deterministic fake decoder.
    * A real deployment decodes payload bytes with an image/audio codec here
    * (the codec libraries are not available in this container). The fake
    * derives a reproducible float vector from the payload bytes so that ALL
    * surrounding Spark plumbing — schema, batching, partitioning, typed
    * mapPartitions signature — is real and testable end-to-end.
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

  /** Image resize (STUB): metadata transform is real (new dims tracked in
    * the typed schema); pixel resampling is the `???` of a real codec,
    * faked as payload truncation to keep the pipeline runnable. */
  def resizeImages(records: Dataset[MultimodalRecord], maxSide: Int): Dataset[MultimodalRecord] = {
    import records.sparkSession.implicits._
    records.map { r =>
      if (r.modality != "image" || math.max(r.width, r.height) <= maxSide) r
      else {
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
