package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** ST4 (SURVEY.md §2.8): watermark semantics — rows later than the watermark
  * behind max event time are dropped from windowed state. Driven with
  * MemoryStream for deterministic batch boundaries. */
class WatermarkSpec extends SparkSpec {
  import spark.implicits._

  test("late rows behind the watermark are dropped from windowed aggregation") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val agg = mem.toDF().toDF("ts", "k")
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "1 hour"), col("k"))
      .agg(count(lit(1)).as("cnt"))
    val q = agg.writeStream.format("memory").queryName("wm_sink")
      .outputMode(OutputMode.Append()).start()

    // batch 1: two rows in the 10:00 window, one at 20:00 → watermark 19:00
    mem.addData((ts("2024-01-01 10:00:00"), "a"), (ts("2024-01-01 10:30:00"), "a"),
      (ts("2024-01-01 20:00:00"), "a"))
    q.processAllAvailable()
    // batch 2: a late row at 10:45 — behind the 19:00 watermark → dropped
    mem.addData((ts("2024-01-01 10:45:00"), "a"))
    q.processAllAvailable()
    // batch 3: advance watermark far so every surviving window is emitted
    mem.addData((ts("2024-01-02 10:00:00"), "a"))
    q.processAllAvailable()
    q.stop()

    val counts = spark.table("wm_sink")
      .select(col("window.start").cast("string"), col("cnt"))
      .as[(String, Long)].collect().toMap
    assert(counts("2024-01-01 10:00:00") === 2L) // late row NOT counted
  }

  test("streaming dedup drops duplicate ids within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Long)]
    val dedup = mem.toDF().toDF("ts", "id")
      .withWatermark("ts", "1 hour")
      .dropDuplicates("id")
    val q = dedup.writeStream.format("memory").queryName("dd_sink")
      .outputMode(OutputMode.Append()).start()
    mem.addData((ts("2024-01-01 10:00:00"), 1L), (ts("2024-01-01 10:01:00"), 2L))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:02:00"), 1L)) // duplicate id → dropped
    q.processAllAvailable()
    q.stop()
    assert(spark.table("dd_sink").count() === 2L)
  }
}
