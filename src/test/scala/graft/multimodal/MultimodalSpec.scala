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
