package graft

import org.apache.spark.sql.functions._

/** Measurement probe for the round-19 zero-exchange additions:
  * (a) bucket-local WINDOW — Spark's full-fact window exchange vs the
  * clustering-declared reader; (b) MERGE-ON-READ mask overhead — the
  * routed rollup before a DELETE, after a DV/position DELETE (masked
  * scans), and the shuffled post-DELETE twin; (c) GRACE sub-partitioning
  * — the SPJ at an unconstrained build vs forced k≈3 grace slices vs the
  * shuffled join; (d) FILE-STATS pruning — a date-ranged rollup on a
  * composite day+bucket layout with pruning on vs the shuffled twin.
  * Reports wall time and total shuffle-write bytes.
  * Run: `sbt "Test/runMain graft.R19Curve"`. */
object R19Curve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_r19curve").toString
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate")),
      s"$base/ord", partitionBy = Seq("bucket(16, o_custkey)"))
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "customer").select(col("c_custkey"), col("c_acctbal"),
        col("c_mktsegment")),
      s"$base/cust", partitionBy = Seq("bucket(16, c_custkey)"))
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate")),
      s"$base/ord_day",
      partitionBy = Seq("month(o_orderdate)", "bucket(8, o_custkey)"))

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m =>
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten))
    })
    // force EVERY output column through a hash-reduce (a bare count would
    // let ColumnPruning elide the window/aggregate under measurement);
    // the single-row final agg costs the same few bytes on both sides
    def measure(name: String)(dfGen: => org.apache.spark.sql.DataFrame): Unit = {
      def forced = {
        val df = dfGen
        df.select(pmod(xxhash64(struct(df.columns.map(col): _*)),
            lit(1000000007L)).as("h"))
          .agg(sum(col("h")).as("hs"), count(lit(1)).as("n"))
      }
      forced.collect()
      val times = (1 to 3).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val r = forced.collect()
        val ms = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300)
        (ms, shuffleBytes.get(), r.head.getLong(1))
      }
      println(f"[r19-curve] $name%-24s rows=${times.head._3}%d " +
        f"best=${times.map(_._1).min}%.0f ms " +
        f"shuffleWrite=${times.map(_._2).max / 1024}%d KiB")
    }

    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    // (a) bucket-local window: the full-fact hash exchange vs zero
    measure("window-shuffled") {
      graft.sources.IcebergRead.snapshot(spark, s"$base/ord")
        .select(col("o_custkey"), col("o_orderkey"),
          row_number().over(w).as("rn"),
          sum(col("o_totalprice")).over(w).as("run"))
    }
    measure("window-routed") {
      graft.sources.Lake.sqlFrame(spark,
        s"""SELECT o_custkey, o_orderkey,
              row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
              sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS run
            FROM '$base/ord'""")
    }

    // (b) merge-on-read masks: routed rollup pre-DELETE, post-DELETE
    // (masked scans), and the shuffled post-DELETE twin
    val rollup = s"""SELECT o_custkey, count(*) AS n,
        round(sum(o_totalprice), 2) AS s
      FROM '$base/ord' GROUP BY o_custkey"""
    measure("agg-routed-nodeletes") {
      graft.sources.Lake.sqlFrame(spark, rollup)
    }
    graft.sources.IcebergWrite.deleteWhere(spark, s"$base/ord",
      col("o_orderkey") % 10 === 0)
    measure("agg-routed-masked") {
      graft.sources.Lake.sqlFrame(spark, rollup)
    }
    measure("agg-shuffled-masked") {
      graft.sources.IcebergRead.snapshot(spark, s"$base/ord")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), round(sum(col("o_totalprice")), 2).as("s"))
    }

    // (c) grace: the same SPJ unconstrained vs forced k≈3 vs shuffled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val maxBucket = graft.sources.Lake
        .bucketLayoutMoR(spark, s"$base/cust", "c_custkey")
        .get._2.values.map(_.map(_._2).sum).max
      def spj(budget: Long) = graft.operators.BucketedJoin.coBucketedJoin(
        spark, s"$base/ord", s"$base/cust", "o_custkey",
        rightKey = "c_custkey", buildBudgetBytes = budget)
      measure("spj-ungraced")(spj(0L))
      measure("spj-grace-k3")(spj(math.max(1L, maxBucket / 3)))
      measure("spj-shuffled") {
        graft.sources.IcebergRead.snapshot(spark, s"$base/ord")
          .join(graft.sources.IcebergRead.snapshot(spark, s"$base/cust")
            .hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4m")

    // (d) composite-layout pruning: date-ranged rollup, pruned bucket
    // scans vs the shuffled twin (same WHERE both sides)
    val cut = "1996-01-01 00:00:00"
    measure("composite-pruned-routed") {
      graft.sources.Lake.sqlFrame(spark,
        s"""SELECT o_custkey, count(*) AS n FROM '$base/ord_day'
            WHERE o_orderdate >= TIMESTAMP '$cut' GROUP BY o_custkey""")
    }
    measure("composite-shuffled") {
      graft.sources.IcebergRead.snapshot(spark, s"$base/ord_day")
        .where(col("o_orderdate") >= lit(java.sql.Timestamp.valueOf(cut)))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("n"))
    }
    spark.stop()
  }
}
