package graft

import org.apache.spark.sql.functions._

/** Diagnostic: scan-split count and raw agg time on compacted vs original
  * lineitem. Run manually; not part of the suite. */
object ScanProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def agg(dir: String) = Tables(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n"))

    def t9(f: => Unit): Double = (1 to 9).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(2)

    Seq("/root/testdata/sf0.1", "/tmp/graft-bench-sf0.1").foreach { dir =>
      val df = Tables(spark, dir, "lineitem")
      println(s"$dir: scan partitions = ${df.rdd.getNumPartitions}")
      agg(dir).collect() // warm
      val tAgg = t9(agg(dir).collect())
      val tSorted = t9(agg(dir).orderBy(col("l_returnflag"), col("l_linestatus")).collect())
      println(f"$dir: agg=${tAgg * 1000}%.1fms  agg+sort=${tSorted * 1000}%.1fms")
    }
    spark.stop()
  }
}
