package graft

import org.apache.spark.sql.functions._

/** Phase-split probe for the composite-layout routed rollup: how much of
  * the wall is DataFrame construction (route planning + per-chunk
  * Catalyst + pruning) vs execution (the union job). Also times the
  * individual pieces (layout probe, pruneLayout, chunk build) so the
  * residual composite-layout cost has a named owner.
  * Run: `tools/run_probe.sh graft.R19Split`. */
object R19Split {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_r19split").toString
    graft.sources.IcebergWrite.append(spark,
      Tables(spark, sfDir, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderdate")),
      s"$base/ord_day",
      partitionBy = Seq("month(o_orderdate)", "bucket(8, o_custkey)"))

    val stmt = s"""SELECT o_custkey, count(*) AS n FROM '$base/ord_day'
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        GROUP BY o_custkey"""

    def ms(t0: Long): Double = (System.nanoTime() - t0) / 1e6
    // warm: codegen caches, route caches, footer caches
    graft.sources.Lake.sqlFrame(spark, stmt).collect()
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.sources.Lake.sqlFrame(spark, stmt)
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.collect()
      val tExec = ms(t1)
      println(f"[r19-split] run$i build=$tBuild%.0f ms exec=$tExec%.0f ms")
    }
    // bypass statement routing: the operator called directly
    val whereC = col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00"))
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.operators.BucketedAgg.bucketLocalAgg(spark, s"$base/ord_day",
        "o_custkey", Seq("o_custkey"), Seq(count(lit(1)).as("n")), Some(whereC))
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.collect()
      println(f"[r19-split] direct$i build=$tBuild%.0f ms exec=${ms(t1)}%.0f ms")
    }
    // statement WITHOUT the WHERE (no pruning tier in the build)
    val stmtNoWhere = s"""SELECT o_custkey, count(*) AS n FROM '$base/ord_day'
        GROUP BY o_custkey"""
    graft.sources.Lake.sqlFrame(spark, stmtNoWhere).collect()
    (1 to 2).foreach { i =>
      val t0 = System.nanoTime()
      val df = graft.sources.Lake.sqlFrame(spark, stmtNoWhere)
      val tBuild = ms(t0)
      val t1 = System.nanoTime()
      df.collect()
      println(f"[r19-split] nowhere$i build=$tBuild%.0f ms exec=${ms(t1)}%.0f ms")
    }
    // micro pieces: one bucket's chunk built alone, step by step
    locally {
      val (n, m, dels) = graft.sources.Lake
        .bucketLayoutMoR(spark, s"$base/ord_day", "o_custkey").get
      val files = m(0)
      val full = graft.sources.Lake.tableSchema(spark, s"$base/ord_day")
      val fullClean = org.apache.spark.sql.types.StructType(
        full.fields.map(_.copy(metadata = org.apache.spark.sql.types.Metadata.empty)))
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val df = org.apache.spark.sql.graft.Bridge.parquetScanDf(spark, fullClean, files)
        val tScan = ms(t0)
        val t1 = System.nanoTime()
        val df2 = df.where(whereC).select(col("o_custkey"))
        val tOps = ms(t1)
        val t2 = System.nanoTime()
        val rdd = org.apache.spark.sql.graft.Bridge.toInternalRdd(df2.coalesce(1))
        println(f"[r19-split] chunk$i files=${files.size} scanDf=$tScan%.0f ms ops=$tOps%.0f ms toRdd=${ms(t2)}%.0f ms")
      }
    }
    // named pieces
    val t2 = System.nanoTime()
    val layout = graft.sources.Lake.bucketLayoutMoR(spark, s"$base/ord_day", "o_custkey")
    println(f"[r19-split] layout probe (cached)=${ms(t2)}%.0f ms buckets=${layout.get._1}")
    val files = layout.get._2.values.map(_.size).sum
    println(s"[r19-split] live files=$files")
    val t3 = System.nanoTime()
    val rej = graft.sources.Lake.fileSkipRejects(spark, s"$base/ord_day",
      col("o_orderdate") >= lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")))
    println(f"[r19-split] fileSkipRejects (cached)=${ms(t3)}%.0f ms rejected=${rej.size}")
    spark.stop()
  }
}
