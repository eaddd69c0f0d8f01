package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Ad-hoc lake-layer scaling probe (not part of the suite): time the
  * O(files)-claimed maintenance paths — incremental changelog read,
  * partition-scoped replaceWhere, bin-pack compaction — over layouts of
  * 64 → 512 files at CONSTANT data volume, on both formats. The file
  * count is the axis: flat-or-mildly-linear wall times back the
  * SCALING.md claims (changelog cost ~ changed files, replaceWhere ~
  * replaced partition + O(files) metadata, compact ~ data + O(files)
  * metadata); a quadratic metadata path would show 8× growth per row.
  *
  * Run: sbt "Test/runMain graft.LakeScaleCurve"
  */
object LakeScaleCurve {

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString + "/tbl"

  private def time(label: String, fmt: String, files: Int)(body: => Long): Unit = {
    val t0 = System.nanoTime()
    val rows = body
    println(f"LAKECURVE $label%-16s fmt=$fmt%-7s files=$files%4d  " +
      f"${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$rows")
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val nRows = 200000L
    val nDays = 32

    def base(s: SparkSession): DataFrame =
      s.range(nRows).select(col("id"), (col("id") % nDays).as("day"),
        (col("id") * 37 % 1000).cast("double").as("value"))

    for (files <- Seq(64, 128, 256, 512); fmt <- Seq("delta", "iceberg")) {
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

      time("changes_between", fmt, files) {
        sources.Lake.changesBetween(spark, dir, v1, v2).count()
      }
      time("replace_where", fmt, files) {
        val repl = base(spark).where(col("day") === 0L)
          .withColumn("value", col("value") + 1.0)
        sources.Lake.replaceWhere(spark, repl, dir, "day = 0")
        0L
      }
      time("compact", fmt, files) {
        sources.Lake.compact(spark, dir, smallFileBytes = Long.MaxValue)
        sources.Lake.fileStats(spark, dir).count()
      }
      time("vacuum", fmt, files) {
        sources.Lake.vacuum(spark, dir, retain = 1, minFileAgeMs = 0L).size.toLong
      }
    }
    spark.stop()
  }
}
