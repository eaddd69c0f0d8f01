package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkSpec {
  import spark.implicits._

  /** Per-file [min,max] of `c` over a parquet directory. */
  private def fileRanges(path: String, c: String): Seq[(Double, Double)] = {
    val files = new java.io.File(path).listFiles()
      .filter(f => f.getName.endsWith(".parquet")).map(_.getPath).toSeq
    files.map { f =>
      spark.read.parquet(f).agg(min(col(c)).cast("double"), max(col(c)).cast("double"))
        .as[(Double, Double)].head()
    }
  }

  private def filesHit(ranges: Seq[(Double, Double)], v: Double): Int =
    ranges.count { case (lo, hi) => lo <= v && v <= hi }

  test("z-order layout prunes on BOTH dimensions where linear sort prunes on one") {
    val orders = Tables(spark, sf001, "orders")
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val linDir = java.nio.file.Files.createTempDirectory("graft_linear").toString
    // 16 files = 4 z-bits at the range split = 2 bits per dimension, so the
    // layout quarters BOTH key ranges (8 files would give one dim only a
    // single top bit — asymmetric pruning)
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"), zDir, targetFiles = 16)
    orders.repartitionByRange(16, col("o_custkey"))
      .sortWithinPartitions(col("o_custkey"))
      .write.mode("overwrite").parquet(linDir)

    // round-trip is lossless
    assert(spark.read.parquet(zDir).count() === orders.count())

    val medPrice = orders.stat.approxQuantile("o_totalprice", Array(0.5), 0.01).head
    val medCust = orders.stat.approxQuantile("o_custkey", Array(0.5), 0.01).head

    // linear-by-custkey: a price point query hits EVERY file (no clustering
    // on the second dimension); z-order: at least half the files' price
    // range excludes it — and same for custkey
    val linPrice = filesHit(fileRanges(linDir, "o_totalprice"), medPrice)
    val zPrice = filesHit(fileRanges(zDir, "o_totalprice"), medPrice)
    assert(linPrice === 16, s"linear layout should not cluster price (hit $linPrice)")
    assert(zPrice <= 8, s"z-order should skip most files on price (hit $zPrice)")

    val zCust = filesHit(fileRanges(zDir, "o_custkey"), medCust)
    assert(zCust <= 8, s"z-order should also skip files on custkey (hit $zCust)")
  }
}
