package graft

import org.apache.spark.sql.functions._

/** Phase-split probe for the composite day×bucket WRITE + routed query
  * (the t117 fixture shape, ~19k partition dirs at sf0.1): append wall,
  * then query wall, with per-phase stamps from the write internals
  * visible via wall-clock deltas. Run: `tools/run_probe.sh graft.R19Write`. */
object R19Write {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("graft_r19write").toString
    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6

    val t0 = System.nanoTime()
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate")),
      s"$root/orders",
      partitionBy = Seq("day(o_orderdate)", "bucket(8, o_custkey)"))
    println(f"[r19-write] orders day+bucket append=${ms(t0)}%.0f ms")

    val t1 = System.nanoTime()
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "customer").select(col("c_custkey"), col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, c_custkey)"))
    println(f"[r19-write] customer bucket append=${ms(t1)}%.0f ms")

    (1 to 2).foreach { i =>
      val t2 = System.nanoTime()
      val df = graft.sources.Lake.sqlFrame(spark,
        s"""SELECT c.c_mktsegment, count(*) AS cnt,
              round(sum(o.o_totalprice), 2) AS rev
            FROM '$root/orders' o JOIN '$root/customer' c
              ON o.o_custkey = c.c_custkey
            WHERE o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
            GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
      val tb = ms(t2)
      val t3 = System.nanoTime()
      df.collect()
      println(f"[r19-write] query$i build=$tb%.0f ms exec=${ms(t3)}%.0f ms")
    }
    spark.stop()
  }
}
