package graft

import org.apache.spark.sql.functions._

/** VERDICT item 8: measure what the lake STREAMING sources' reads gain
  * from the round-19 manifest-backed scans (`Bridge.parquetScanDf`),
  * using the round-20 kill-switch `graft.scan.manifestSizes=false` to
  * force the old listing-based construction. Streaming batches read
  * through the same snapshot readers: batch 0 seeds from the CURRENT
  * snapshot (many files — where listing hurt), and each tail batch reads
  * the commits it admits (few files). Both are timed here as plan-side
  * construction + toRdd (the listing job fires during construction),
  * best of 5 after warm-up. Run: `tools/run_probe.sh graft.R20StreamTail`. */
object R20StreamTail {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[8]")
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_r20st").toString

    val orders = Tables(spark, sfDir, "orders").select(col("o_orderkey"),
      col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    // Iceberg: one big commit (~660 files: month×bucket(8)), one small tail
    graft.sources.IcebergWrite.append(spark, orders, s"$root/ice",
      partitionBy = Seq("month(o_orderdate)", "bucket(8, o_custkey)"))
    val iceSeed = graft.sources.IcebergRead.currentSnapshotId(spark, s"$root/ice")
    graft.sources.IcebergWrite.append(spark, orders.limit(100), s"$root/ice",
      partitionBy = Seq("month(o_orderdate)", "bucket(8, o_custkey)"))
    val iceTip = graft.sources.IcebergRead.currentSnapshotId(spark, s"$root/ice")
    // Delta: one big commit (~84 month dirs), one small tail
    val withMonth = orders.withColumn("om", date_format(col("o_orderdate"), "yyyy-MM"))
    graft.sources.DeltaWrite.append(spark, withMonth, s"$root/del",
      partitionBy = Seq("om"))
    val delSeed = graft.sources.DeltaRead.snapshotInfo(spark, s"$root/del").version
    graft.sources.DeltaWrite.append(spark, withMonth.limit(100), s"$root/del",
      partitionBy = Seq("om"))
    val delTip = graft.sources.DeltaRead.snapshotInfo(spark, s"$root/del").version

    def best(n: Int)(body: => Unit): Double = {
      body // warm-up
      (1 to n).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e6
      }.min
    }
    def measure(name: String)(frame: => org.apache.spark.sql.DataFrame): Unit = {
      val times = Seq(true, false).map { flag =>
        spark.conf.set("graft.scan.manifestSizes", flag.toString)
        try best(5) { frame.queryExecution.toRdd; () }
        finally spark.conf.unset("graft.scan.manifestSizes")
      }
      println(f"[r20-st] $name%-28s manifest=${times.head}%.0f ms " +
        f"listing=${times(1)}%.0f ms (${times(1) / times.head}%.1fx)")
    }

    measure("ice-batch0-seed") {
      graft.sources.IcebergRead.snapshot(spark, s"$root/ice", iceSeed)
    }
    measure("ice-tail-batch") {
      graft.sources.IcebergRead.addsBetween(spark, s"$root/ice", iceSeed, iceTip)
    }
    measure("delta-batch0-seed") {
      graft.sources.DeltaRead.snapshot(spark, s"$root/del", delSeed)
    }
    measure("delta-tail-batch") {
      graft.sources.DeltaRead.addsBetween(spark, s"$root/del", delSeed, delTip)
    }
    spark.stop()
  }
}
