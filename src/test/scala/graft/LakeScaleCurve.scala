package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc lake-layer scaling probe (not part of the suite): time the
  * O(files)-claimed maintenance paths — snapshot-state load, stats-pruned
  * scan, incremental changelog read, partition-scoped replaceWhere,
  * bin-pack compaction, vacuum, history — over layouts of 128 → 1024
  * files at CONSTANT data volume, on both formats, plus a separate
  * commit-count axis (log replay over 25 → 200 commits). The file count
  * is the axis: flat-or-mildly-linear wall times back the SCALING.md
  * claims (changelog cost ~ changed files, replaceWhere ~ replaced
  * partition + O(files) metadata, compact ~ data + O(files) metadata); a
  * quadratic metadata path would show 4× growth per doubling.
  *
  * Run: sbt "Test/runMain graft.LakeScaleCurve [labels...]"
  * (labels filter measurements; `build`/table setup always runs)
  */
object LakeScaleCurve {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/tbl"

  private var only: Set[String] = Set.empty

  private def time(label: String, fmt: String, files: Int)(body: => Long): Unit = {
    if (only.nonEmpty && !only(label)) return
    val t0 = System.nanoTime()
    val rows = body
    println(f"LAKECURVE $label%-16s fmt=$fmt%-7s files=$files%4d  " +
      f"${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
  }

  def main(args: Array[String]): Unit = {
    only = args.toSet
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val nRows = 200000L
    val nDays = 32

    def base(s: SparkSession): DataFrame =
      s.range(nRows).select(col("id"), (col("id") % nDays).as("day"),
        (col("id") * 37 % 1000).cast("double").as("value"))

    val skipFiles = only("logonly"); val skipLog = only("filesonly")
    only -= "logonly"; only -= "filesonly"

    for (files <- Seq(128, 256, 512, 1024) if !skipFiles; fmt <- Seq("delta", "iceberg")) {
      val dir = tmp(s"graft_lakecurve_${fmt}_$files")
      // `files` data files in ONE commit: files/nDays tasks × nDays
      // partition dirs; constant data volume throughout
      val df = base(spark).repartition(math.max(1, files / nDays))
      val v1 =
        if (fmt == "delta")
          sources.DeltaWrite.append(spark, df, dir, partitionBy = Seq("day"))
        else sources.IcebergWrite.append(spark, df, dir, partitionBy = Seq("day"))
      val extra = base(spark).where(col("id") < 10000L)
        .withColumn("id", col("id") + nRows)
      val v2 =
        if (fmt == "delta")
          sources.DeltaWrite.append(spark, extra, dir, partitionBy = Seq("day"))
        else sources.IcebergWrite.append(spark, extra, dir, partitionBy = Seq("day"))

      time("snapshot_state", fmt, files) {
        sources.Lake.fileStats(spark, dir).count()
      }
      time("pruned_scan", fmt, files) {
        // narrow id interval: survives only in the files whose stats span it
        val (scan, hit, total) = sources.Lake.scanPruned(spark, dir,
          col("id") >= 1000L && col("id") < 1200L)
        require(hit <= total, s"pruning inverted ($hit of $total)")
        scan.count()
      }
      time("changes_between", fmt, files) {
        sources.Lake.changesBetween(spark, dir, v1, v2).count()
      }
      time("replace_where", fmt, files) {
        val repl = base(spark).where(col("day") === 0L)
          .withColumn("value", col("value") + 1.0)
        sources.Lake.replaceWhere(spark, repl, dir, "day = 0")
        0L
      }
      time("history", fmt, files) {
        sources.Lake.history(spark, dir).count()
      }
      time("compact", fmt, files) {
        sources.Lake.compact(spark, dir, smallFileBytes = Long.MaxValue)
        sources.Lake.fileStats(spark, dir).count()
      }
      time("vacuum", fmt, files) {
        sources.Lake.vacuum(spark, dir, retain = 1, minFileAgeMs = 0L).size.toLong
      }
    }

    // commit-count axis: snapshot/state load over a long log (the replay
    // the file-count rows above cannot isolate — 2 commits each). One
    // file per commit keeps the file axis constant-per-commit.
    for (commits <- Seq(25, 50, 100, 200) if !skipLog; fmt <- Seq("delta", "iceberg")) {
      val dir = tmp(s"graft_lakecurve_log_${fmt}_$commits")
      val slice = nRows / 200
      for (c <- 0 until commits) {
        val part = base(spark)
          .where(col("id") >= c * slice && col("id") < (c + 1) * slice)
          .coalesce(1)
        if (fmt == "delta") sources.DeltaWrite.append(spark, part, dir)
        else sources.IcebergWrite.append(spark, part, dir)
      }
      time("log_replay", fmt, commits) {
        sources.Lake.fileStats(spark, dir).count()
      }
      time("log_history", fmt, commits) {
        sources.Lake.history(spark, dir).count()
      }
      // Delta's answer to unbounded replay: checkpoint (Lake.maintain's
      // cadence does this automatically) — replay drops to O(tail)
      if (fmt == "delta") {
        sources.DeltaWrite.checkpoint(spark, dir)
        time("log_replay_ckpt", fmt, commits) {
          sources.Lake.fileStats(spark, dir).count()
        }
      }
    }
    spark.stop()
  }
}
