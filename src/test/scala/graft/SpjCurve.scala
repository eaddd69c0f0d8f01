package graft

import org.apache.spark.sql.functions._

/** Measurement probe for the storage-partitioned join (S9bj): builds two
  * `bucket(16, o_orderkey)` Iceberg tables from sf0.1 lineitem/orders and
  * runs the SAME aggregate through (a) the ordinary shuffled join over the
  * two snapshots and (b) `BucketedJoin.coBucketedJoin`, reporting wall time
  * and total shuffle-write bytes per run. Run:
  * `sbt "Test/runMain graft.SpjCurve"`. */
object SpjCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_spjcurve").toString
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey").as("o_orderkey"), col("l_extendedprice"),
          col("l_discount")),
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
      // warm once, then 3 timed passes (fresh frames — no shuffle reuse)
      df.collect()
      val times = (1 to 3).map { _ =>
        shuffleBytes.set(0)
        val t0 = System.nanoTime()
        val n = df.collect().head.getLong(0)
        val ms = (System.nanoTime() - t0) / 1e6
        Thread.sleep(300) // listener events are async — let the bus drain
        (ms, shuffleBytes.get(), n)
      }
      val bestMs = times.map(_._1).min
      println(f"[spj-curve] $name%-14s rows=${times.head._3}%d " +
        f"best=${bestMs}%.0f ms shuffleWrite=${times.map(_._2).max / 1024}%d KiB")
    }
    // turn off auto-broadcast so the shuffled twin actually exchanges both
    // sides — the 100 TB fact-fact shape this operator exists for
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      measure("shuffled") {
        graft.sources.IcebergRead.snapshot(spark, s"$base/li")
          .join(graft.sources.IcebergRead.snapshot(spark, s"$base/ord"), "o_orderkey")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * col("o_totalprice")).as("x"))
      }
      measure("bucket-join") {
        graft.operators.BucketedJoin
          .coBucketedJoin(spark, s"$base/li", s"$base/ord", "o_orderkey")
          .agg(count(lit(1)).as("n"),
            sum(col("l_extendedprice") * col("o_totalprice")).as("x"))
      }
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4m")
  }
}
