package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Sessionize
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** ST3↔batch parity and ST7 file-sink coverage (SURVEY.md §2.8). */
class StreamParitySpec extends SparkSpec {
  import spark.implicits._

  test("session_window count equals the gaps-and-islands count under >= gap semantics") {
    val streamed = StreamOps.sessionCount(spark, sf001).as[Long].head()
    val batch = Sessionize
      .withSessionId(Tables(spark, sf001, "events"), "user_id", "ts", "event_id",
        1800000000L, strictGreater = false)
      .agg(sum(col("__is_start")).cast("long")).as[Long].head()
    assert(streamed === batch)
  }

  test("stream-stream interval join equals the batch join on the same predicate") {
    val streamed = StreamOps.purchaseSignupJoin(spark, sf001)
      .as[(Long, Double)].head()
    val ev = Tables(spark, sf001, "events")
    val p = ev.where(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("p_ts"), col("value"))
    val s = ev.where(col("event_type") === "signup")
      .select(col("user_id").as("s_user"), col("ts").as("s_ts"))
    val batch = p.join(s,
      col("p_user") === col("s_user") &&
        col("p_ts") >= col("s_ts") &&
        col("p_ts") <= col("s_ts") + expr("INTERVAL 7 DAYS"))
      .agg(count(lit(1)), round(sum(col("value")), 2))
      .as[(Long, Double)].head()
    assert(streamed === batch)
  }

  test("dropDuplicatesWithinWatermark on doubled input equals single-copy counts") {
    val deduped = StreamOps.streamingDedupWithinWatermark(spark, sf001)
      .as[(String, Long)].collect().toMap
    val batch = Tables(spark, sf001, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      .as[(String, Long)].collect().toMap
    assert(deduped === batch)
  }

  test("ST7: parquet file sink writes exactly-once output readable as a table") {
    val out = java.nio.file.Files.createTempDirectory("graft_filesink").toString
    val cp = java.nio.file.Files.createTempDirectory("graft_filesink_cp").toString
    val q = StreamOps.eventsStream(spark, sf001)
      .select(col("event_id"), col("event_type"), col("value"))
      .writeStream
      .format("parquet")
      .option("path", out)
      .option("checkpointLocation", cp)
      .outputMode(OutputMode.Append())
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    val written = spark.read.parquet(out)
    val expected = Tables(spark, sf001, "events").count()
    assert(written.count() === expected)
    // the sink's _spark_metadata commit log marks the batch committed
    assert(new java.io.File(s"$out/_spark_metadata").exists())
  }

  test("transformWithState totals equal the flatMapGroupsWithState totals") {
    val tws = StreamOps.twsPurchaseTotals(spark, sf001)
      .as[(Long, Double)].collect().toSeq
    val fmgws = StreamOps.statefulPurchaseTotals(spark, sf001)
      .as[(Long, Double)].collect().toSeq
    assert(tws.nonEmpty)
    assert(tws === fmgws)
  }

  test("streaming quality monitor: per-batch audits sum to the batch audit") {
    import graft.operators.Quality
    val root = java.nio.file.Files.createTempDirectory("graft_qmon")
    val landing = root.resolve("landing"); java.nio.file.Files.createDirectories(landing)
    val metrics = s"$root/metrics"
    // pre-created EMPTY output dir (orchestrators do this) must not trip
    // the replay guard's table read on the first batch
    java.nio.file.Files.createDirectories(root.resolve("metrics"))

    val batchA = Seq[(java.lang.Long, String)]((1L, "F"), (2L, "X"), (null, "O"))
      .toDF("k", "status")
    val batchB = Seq[(java.lang.Long, String)]((3L, "F"), (null, null))
      .toDF("k", "status")
    batchA.coalesce(1).write.parquet(s"$landing/tmpa")
    batchB.coalesce(1).write.parquet(s"$landing/tmpb")
    import scala.jdk.CollectionConverters._
    // flatten part files into the landing dir, ordered names → stable batches
    Seq("tmpa" -> "a.parquet", "tmpb" -> "b.parquet").foreach { case (d, tgt) =>
      val part = java.nio.file.Files.walk(landing.resolve(d)).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq.head
      java.nio.file.Files.move(part, landing.resolve(tgt))
      java.nio.file.Files.walk(landing.resolve(d)).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }

    val rules = Seq(Quality.NotNull("k"), Quality.InSet("status", Seq("F", "O")))
    StreamOps.qualityMonitorStream(spark, landing.toString, batchA.schema, rules,
      metrics, maxFilesPerTrigger = 1)

    val m = spark.read.parquet(metrics)
    // one row per rule per micro-batch
    assert(m.count() === 4)
    assert(m.select(countDistinct(col("batch_id"))).as[Long].head() === 2L)
    // additive rules: per-batch sums equal the whole-input audit
    val summed = m.groupBy(col("rule"))
      .agg(sum(col("violations")).as("v"), sum(col("total")).as("t"))
      .as[(String, Long, Long)].collect().toMap2
    val whole = Quality.check(batchA.unionAll(batchB), rules)
      .select(col("rule"), col("violations"), col("total"))
      .as[(String, Long, Long)].collect().toMap2
    assert(summed === whole)

    // replay guard: re-running from a FRESH checkpoint replays both batch
    // ids against the existing metrics table — nothing may double-append
    StreamOps.qualityMonitorStream(spark, landing.toString, batchA.schema, rules,
      metrics, maxFilesPerTrigger = 1,
      checkpointDir = Some(s"$root/checkpoint2"))
    assert(spark.read.parquet(metrics).count() === 4)
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }

  test("streaming drift monitor: in-distribution batch ~0 PSI, shifted batch drifts") {
    import graft.operators.Profile
    val root = java.nio.file.Files.createTempDirectory("graft_driftmon")
    val landing = root.resolve("landing"); java.nio.file.Files.createDirectories(landing)
    val metrics = s"$root/metrics"

    // reference: uniform over [0, 100); batch A matches it, batch B is
    // concentrated in the top bucket
    val ref = spark.range(1000).select((col("id") % 100).cast("double").as("v"))
    val batchA = spark.range(500).select((col("id") % 100).cast("double").as("v"))
    val batchB = spark.range(500).select(lit(95.0).as("v"))
    import scala.jdk.CollectionConverters._
    Seq(batchA -> "a.parquet", batchB -> "b.parquet").foreach { case (df, tgt) =>
      val d = landing.resolve(tgt + ".tmp")
      df.coalesce(1).write.parquet(d.toString)
      val part = java.nio.file.Files.walk(d).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq.head
      java.nio.file.Files.move(part, landing.resolve(tgt))
      java.nio.file.Files.walk(d).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }

    StreamOps.driftMonitorStream(spark, landing.toString, batchA.schema, "v",
      ref, lo = 0.0, hi = 100.0, nBuckets = 10, metricsDir = metrics)

    val m = spark.read.parquet(metrics)
    assert(m.count() === 20) // 10 buckets × 2 batches, abandoned buckets included
    val psiByBatch = m.groupBy(col("batch_id"))
      .agg((sum(col("psi_micro")) / 1000000.0).as("psi"))
      .as[(Long, Double)].collect().toMap
    assert(psiByBatch(0L) === 0.0) // identical distribution → exactly 0
    assert(psiByBatch(1L) > 1.0)   // gross shift → strong drift signal
    // batch PSI equals the batch-mode psiAgainst over the same data
    val direct = Profile.psiAgainst(batchB, col("v"),
      Profile.bucketCounts(ref, col("v"), 0.0, 100.0, 10), 0.0, 100.0)
      .agg(sum(col("psi_micro"))).as[Long].head()
    assert(psiByBatch(1L) === direct / 1000000.0)

    // replay guard: fresh checkpoint, nothing double-appends
    StreamOps.driftMonitorStream(spark, landing.toString, batchA.schema, "v",
      ref, lo = 0.0, hi = 100.0, nBuckets = 10, metricsDir = metrics,
      checkpointDir = Some(s"$root/checkpoint2"))
    assert(spark.read.parquet(metrics).count() === 20)
  }

  test("streaming heavy hitters equal the batch operator over all ingested data") {
    import graft.operators.FreqSketch
    val root = java.nio.file.Files.createTempDirectory("graft_hhstream")
    val landing = root.resolve("landing"); java.nio.file.Files.createDirectories(landing)

    // skewed vocabulary split across two micro-batches, heavy mass split so
    // no single batch decides the answer; nulls count toward N on both
    // paths (count(*) semantics) but are never candidates
    val batchA = (Seq.fill(40)(Some("hot")) ++ Seq.fill(15)(Some("warm")) ++
      (1 to 60).map(i => Some(s"a$i")) ++ Seq.fill(10)(Option.empty[String]))
      .toDF("w")
    val batchB = (Seq.fill(35)(Some("hot")) ++ Seq.fill(25)(Some("warm")) ++
      (1 to 60).map(i => Some(s"b$i"))).toDF("w")
    import scala.jdk.CollectionConverters._
    Seq(batchA -> "a", batchB -> "b").foreach { case (df, nm) =>
      df.coalesce(1).write.parquet(s"$landing/tmp$nm")
      val part = java.nio.file.Files.walk(landing.resolve(s"tmp$nm")).iterator().asScala
        .filter(_.toString.endsWith(".parquet")).toSeq.head
      java.nio.file.Files.move(part, landing.resolve(s"$nm.parquet"))
      java.nio.file.Files.walk(landing.resolve(s"tmp$nm")).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }

    val k = 10
    val streamed = StreamOps.heavyHittersStream(spark, landing.toString, batchA.schema,
      df => df.select(col("w").as("item")), k, s"$root/state")
      .as[(String, Long)].collect().toSeq
    val batch = FreqSketch.heavyHitters(
      batchA.unionAll(batchB).select(col("w").as("item")), "item", k)
      .as[(String, Long)].collect().toSeq
    assert(streamed === batch)
    assert(streamed.map(_._1).toSet === Set("hot", "warm")) // sanity: the planted mass
    // cross-batch state stays bounded by k; only the last committed
    // version survives (superseded versions are cleaned up)
    assert(spark.read.parquet(s"$root/state/cands_v1").count() <= k)
    assert(!java.nio.file.Files.exists(root.resolve("state/cands_v0")))
  }

  test("streaming incremental dedup equals sequential batch processing") {
    import graft.operators.Dedup
    val root = java.nio.file.Files.createTempDirectory("graft_incdedup")
    val landing = root.resolve("landing"); java.nio.file.Files.createDirectories(landing)
    val accepted = s"$root/accepted"

    val batchA = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "some unique first-batch content about spark streaming")).toDF("doc_id", "text")
    val batchB = Seq(
      (3L, "the quick brown fox jumps over the lazy dog today"), // dup of accepted 1
      (4L, "fresh second-batch document with new words entirely"),
      (5L, "fresh second-batch document with new words entirely")) // within-batch dup of 4
      .toDF("doc_id", "text")
    // two files, ordered mod-times → two micro-batches (maxFilesPerTrigger=1)
    batchA.coalesce(1).write.parquet(s"$landing/a")
    Thread.sleep(1100)
    batchB.coalesce(1).write.parquet(s"$landing/b")
    // flatten part files into the landing dir so the file source sees them
    val files = java.nio.file.Files.walk(landing).iterator()
    import scala.jdk.CollectionConverters._
    files.asScala.filter(_.toString.endsWith(".parquet")).toSeq.sortBy(
      p => java.nio.file.Files.getLastModifiedTime(p).toMillis).zipWithIndex.foreach {
      case (p, i) => java.nio.file.Files.move(p, landing.resolve(s"batch$i.parquet"))
    }
    Seq("a", "b").foreach { d =>
      java.nio.file.Files.walk(landing.resolve(d)).iterator().asScala.toSeq
        .reverse.foreach(java.nio.file.Files.delete)
    }

    StreamOps.incrementalDedupStream(spark, landing.toString, batchA.schema,
      "doc_id", "text", 0.8, accepted)
    val streamed = spark.read.parquet(accepted).select("doc_id").as[Long].collect().sorted.toSeq

    // sequential batch reference: process A against empty, then B against A's survivors
    val keptA = Dedup.incrementalDropNearDuplicates(batchA, batchA.where(lit(false)), "doc_id", "text", 0.8)
    val keptB = Dedup.incrementalDropNearDuplicates(batchB, keptA, "doc_id", "text", 0.8)
    val reference = keptA.unionByName(keptB).select("doc_id").as[Long].collect().sorted.toSeq

    assert(streamed === reference)
    assert(streamed === Seq(1L, 2L, 4L))
  }
}
