package graft

import org.apache.spark.sql.functions._

/** Measurement probe for the round-18 zero-exchange additions:
  * (a) `count(DISTINCT x)` — Spark's Expand + double-shuffle plan vs the
  * bucket-local seen-set route; (b) the flush-and-merge SPILL overhead —
  * the same bucket-local rollup with the group map forced to flush every
  * 4k groups vs unbounded; (c) the MULTI-TABLE SPJ — a 3-table
  * fact⋈fact⋈dim star through the ordinary shuffled plan vs the routed
  * pair + broadcast dim. Reports wall time and total shuffle-write bytes.
  * Run: `sbt "Test/runMain graft.R18Curve"`. */
object R18Curve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_r18curve").toString
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_suppkey"),
          col("l_extendedprice")),
      s"$base/li", partitionBy = Seq("bucket(16, o_orderkey)"))
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      s"$base/ord", partitionBy = Seq("bucket(16, o_orderkey)"))
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      s"$base/cust")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        Option(te.taskMetrics).foreach(m =>
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten))
    })
    def measure(name: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      df.count()
      val times = (1 to 3).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val n = df.count()
        val ms = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300)
        (ms, shuffleBytes.get(), n)
      }
      println(f"[r18-curve] $name%-22s rows=${times.head._3}%d " +
        f"best=${times.map(_._1).min}%.0f ms " +
        f"shuffleWrite=${times.map(_._2).max / 1024}%d KiB")
    }
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      // (a) count(DISTINCT): Expand + two exchanges vs bucket-local exact
      measure("distinct-shuffled") {
        graft.sources.IcebergRead.snapshot(spark, s"$base/li")
          .groupBy(col("o_orderkey"))
          .agg(countDistinct(col("l_suppkey")).as("d"), count(lit(1)).as("n"))
      }
      measure("distinct-bucket") {
        graft.operators.BucketedAgg.bucketLocalAgg(spark, s"$base/li",
          "o_orderkey", Seq("o_orderkey"),
          Seq(countDistinct(col("l_suppkey")).as("d"), count(lit(1)).as("n")))
      }
      // (b) spill overhead: same rollup, map forced to flush every 4k groups
      val aggs = Seq(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
      measure("bucket-agg-inmem") {
        graft.operators.BucketedAgg.bucketLocalAgg(spark, s"$base/li",
          "o_orderkey", Seq("o_orderkey"), aggs)
      }
      spark.conf.set("graft.local.spillRows", "4096")
      try measure("bucket-agg-spill4k") {
        graft.operators.BucketedAgg.bucketLocalAgg(spark, s"$base/li",
          "o_orderkey", Seq("o_orderkey"), aggs)
      } finally spark.conf.unset("graft.local.spillRows")
      // (c) 3-table star: shuffled chain vs routed pair + broadcast dim
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4m")
      measure("star-shuffled") {
        graft.sources.IcebergRead.snapshot(spark, s"$base/li")
          .join(graft.sources.IcebergRead.snapshot(spark, s"$base/ord")
            .hint("shuffle_hash"), "o_orderkey")
          .join(graft.sources.IcebergRead.snapshot(spark, s"$base/cust"),
            col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_mktsegment"))
          .agg(count(lit(1)).as("n"), round(sum(col("l_extendedprice")), 2).as("s"))
      }
      measure("star-routed") {
        graft.sources.Lake.sqlFrame(spark,
          s"""SELECT c.c_mktsegment, count(*) AS n,
                round(sum(l.l_extendedprice), 2) AS s
              FROM '$base/li' l JOIN '$base/ord' o ON l.o_orderkey = o.o_orderkey
                JOIN '$base/cust' c ON o.o_custkey = c.c_custkey
              GROUP BY c.c_mktsegment""")
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4m")
    spark.stop()
  }
}
