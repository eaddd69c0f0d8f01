package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

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

  /** Driver-side reference xy2d (Hamilton's classic loop). */
  private def refHilbert(bits: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    val n = 1L << bits
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("hilbert value: a true space-filling curve (each step grid-adjacent), matches reference") {
    val bits = 3 // the full 8×8 grid, exhaustively
    val grid = (for (x <- 0L until 8L; y <- 0L until 8L) yield (x, y)).toDF("x", "y")
    val got = Layout.withHilbertValue(grid, "x", "y", "d", bits)
      .select(col("x"), col("y"), col("d"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // bijective onto 0..63 and every consecutive pair of cells adjacent —
    // the locality property Morton order does NOT have
    assert(got.map(_._3).sorted.toSeq === (0L until 64L))
    val byD = got.sortBy(_._3)
    byD.sliding(2).foreach { case Array((x1, y1, _), (x2, y2, _)) =>
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) === 1L,
        s"curve jumped from ($x1,$y1) to ($x2,$y2)")
    }
    got.foreach { case (x, y, d) => assert(d === refHilbert(bits, x, y)) }
  }

  test("N-D hilbert: exhaustive bijection + unit steps in 2-D, 3-D and 4-D") {
    // (dims, bits): full grids of 256–512 cells, exhaustively
    for ((dims, bits) <- Seq((2, 3), (3, 2), (3, 3), (4, 2))) {
      val n = 1L << bits
      val names = (0 until dims).map(j => s"c$j")
      val points = (0L until math.round(math.pow(n.toDouble, dims.toDouble))).map { i =>
        Row.fromSeq((0 until dims).map(j =>
          (i >> (bits * j)) & (n - 1)))
      }
      val grid = spark.createDataFrame(
        spark.sparkContext.parallelize(points, 4),
        StructType(names.map(StructField(_, LongType, nullable = false))))
      val got = Layout.withHilbertValueN(grid, names, "d", bits)
        .select((names :+ "d").map(col): _*)
        .collect().map(r => (names.indices.map(r.getLong), r.getLong(dims)))
      val total = got.length.toLong
      assert(got.map(_._2).sorted.toSeq === (0L until total),
        s"$dims-D/$bits-bit hilbert must be bijective onto 0..${total - 1}")
      got.sortBy(_._2).sliding(2).foreach { case Array((a, _), (b, _)) =>
        val manhattan = a.zip(b).map { case (u, v) => math.abs(u - v) }.sum
        assert(manhattan === 1L,
          s"$dims-D curve jumped from $a to $b (distance $manhattan)")
      }
    }
  }

  test("hilbertCluster accepts 3+ columns and preserves the data exactly") {
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    val clustered = Layout.hilbertCluster(orders,
      Seq("o_custkey", "o_totalprice", "o_orderdate"), targetFiles = 8, bits = 8)
    assert(clustered.columns.toSeq === orders.columns.toSeq)
    assert(clustered.count() === orders.count())
    assert(clustered.agg(sum(col("o_orderkey"))).head().getLong(0) ===
      orders.agg(sum(col("o_orderkey"))).head().getLong(0))
  }

  test("hilbert layout prunes both dimensions, at least as tightly as z-order on average") {
    val orders = Tables(spark, sf001, "orders")
    val hDir = java.nio.file.Files.createTempDirectory("graft_hilbert").toString
    val zDir = java.nio.file.Files.createTempDirectory("graft_zorder_cmp").toString
    Layout.hilbertWrite(orders, "o_custkey", "o_totalprice", hDir, targetFiles = 16)
    Layout.zorderWrite(orders, Seq("o_custkey", "o_totalprice"), zDir, targetFiles = 16)
    assert(spark.read.parquet(hDir).count() === orders.count())

    def avgHit(dir: String, c: String, pts: Seq[Double]): Double = {
      val ranges = fileRanges(dir, c)
      pts.map(v => filesHit(ranges, v)).sum.toDouble / pts.size
    }
    val pricePts = orders.stat.approxQuantile("o_totalprice",
      Array(0.1, 0.3, 0.5, 0.7, 0.9), 0.01).toSeq
    val custPts = orders.stat.approxQuantile("o_custkey",
      Array(0.1, 0.3, 0.5, 0.7, 0.9), 0.01).toSeq
    val hAvg = avgHit(hDir, "o_totalprice", pricePts) + avgHit(hDir, "o_custkey", custPts)
    val zAvg = avgHit(zDir, "o_totalprice", pricePts) + avgHit(zDir, "o_custkey", custPts)
    assert(hAvg <= 16.0, s"hilbert point queries should skip most files (avg $hAvg of 32)")
    assert(hAvg <= zAvg + 2.0,
      s"hilbert locality should be in z-order's class or better (h=$hAvg z=$zAvg)")
  }
}
