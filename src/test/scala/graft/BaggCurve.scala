package graft

import org.apache.spark.sql.functions._

/** Measurement probe for bucket-local aggregation (S9ba) and the SPJ+agg
  * fusion (S9baf): builds `bucket(16, o_orderkey)` Iceberg tables from
  * sf0.1 lineitem/orders and runs the SAME high-cardinality rollup
  * (GROUP BY o_orderkey — ~150k groups at sf0.1, the shape where partial
  * aggregation barely reduces before the exchange) through (a) the
  * ordinary shuffled groupBy, (b) `BucketedAgg.bucketLocalAgg`, and the
  * join+rollup through (c) shuffled join+agg vs (d) the fused zero-
  * exchange route; reports wall time and total shuffle-write bytes.
  * Run: `sbt "Test/runMain graft.BaggCurve"`. */
object BaggCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_baggcurve").toString
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"),
          col("l_quantity")),
      s"$base/li", partitionBy = Seq("bucket(16, o_orderkey)"))
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_totalprice")),
      s"$base/ord", partitionBy = Seq("bucket(16, o_orderkey)"))

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
      val bestMs = times.map(_._1).min
      println(f"[bagg-curve] $name%-16s groups=${times.head._3}%d " +
        f"best=${bestMs}%.0f ms shuffleWrite=${times.map(_._2).max / 1024}%d KiB")
    }
    val aggs = Seq(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"),
      max(col("l_quantity")).as("q"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      measure("shuffled-agg") {
        graft.sources.IcebergRead.snapshot(spark, s"$base/li")
          .groupBy(col("o_orderkey")).agg(aggs.head, aggs.tail: _*)
      }
      measure("bucket-agg") {
        graft.operators.BucketedAgg.bucketLocalAgg(spark, s"$base/li",
          "o_orderkey", Seq("o_orderkey"), aggs)
      }
      measure("shuffled-join+agg") {
        graft.sources.IcebergRead.snapshot(spark, s"$base/li")
          .join(graft.sources.IcebergRead.snapshot(spark, s"$base/ord"), "o_orderkey")
          .groupBy(col("o_orderkey"))
          .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s"))
      }
      measure("fused-spj+agg") {
        // splitBucketBytes = 0: localAgg needs whole buckets per partition
        graft.operators.BucketedAgg.localAgg(spark,
          graft.operators.BucketedJoin.coBucketedJoin(spark, s"$base/li",
            s"$base/ord", "o_orderkey",
            leftCols = Seq("o_orderkey", "l_extendedprice"),
            rightCols = Seq("o_orderkey"), splitBucketBytes = 0L),
          Seq("o_orderkey"),
          Seq(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("s")))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4m")
  }
}
