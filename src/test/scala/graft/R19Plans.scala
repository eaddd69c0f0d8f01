package graft

/** Dump `.explain("formatted")` for every headline bench query (B1–B15)
  * plus the round-19 routed shapes, into `plans/r19/<name>_<tag>.txt` —
  * the optimization round's plan-shape evidence. Mirrors Bench's layout
  * step (Layout.compact into /tmp) so the captured scans are the ones the
  * timed runs execute. Run: `tools/run_probe.sh graft.R19Plans <tag>`.
  * For the routed shapes the physical plan is an ExistingRDD (the
  * co-partitioned reader lives below the DataFrame bridge), so the RDD
  * lineage (`toDebugString` — the zero-ShuffledRDD evidence) is appended.
  */
object R19Plans {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("before")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[8]")
    val outDir = java.nio.file.Paths.get("plans/r19")
    java.nio.file.Files.createDirectories(outDir)

    val benchDir = s"/tmp/graft-bench-${new java.io.File(sfDir).getName}"
    val targetFiles = Map(
      "lineitem" -> 16, "orders" -> 8, "events" -> 16, "customer" -> 4,
      "part" -> 4, "documents" -> 8, "embeddings" -> 8)
    Tables.names.foreach { n =>
      val dst = s"$benchDir/$n.parquet"
      if (!new java.io.File(dst).exists)
        operators.Layout.compact(
          Tables(spark, sfDir, n), dst, targetFiles.getOrElse(n, 1))
    }

    def dump(name: String, df: org.apache.spark.sql.DataFrame,
        withRdd: Boolean = false): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val rdd = if (!withRdd) "" else {
        "\n== RDD lineage (toDebugString) ==\n" +
          df.queryExecution.toRdd.toDebugString + "\n"
      }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        (plan + rdd).getBytes("UTF-8"))
      println(s"[plans] wrote ${name}_$tag.txt")
    }

    queries.BenchQueries.headline.foreach { q =>
      try dump(q.name, q.build(spark, benchDir))
      catch { case e: Throwable =>
        System.err.println(s"[plans] ${q.name} failed: ${e.getMessage}")
      }
    }

    // Round-19 routed shapes (the R19Curve fixtures): window route, MoR
    // masked rollup, SPJ, composite-layout pruned rollup. Fresh temp
    // tables per invocation; plans carry the RDD lineage (the physical
    // story is below the DataFrame bridge).
    import org.apache.spark.sql.functions._
    val base = java.nio.file.Files.createTempDirectory("graft_r19plans").toString
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

    try dump("routed_window", graft.sources.Lake.sqlFrame(spark,
      s"""SELECT o_custkey, o_orderkey,
            row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
            sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS run
          FROM '$base/ord'"""), withRdd = true)
    catch { case e: Throwable => System.err.println(s"[plans] routed_window: $e") }

    try dump("routed_spj", graft.operators.BucketedJoin.coBucketedJoin(
      spark, s"$base/ord", s"$base/cust", "o_custkey", rightKey = "c_custkey"),
      withRdd = true)
    catch { case e: Throwable => System.err.println(s"[plans] routed_spj: $e") }

    graft.sources.IcebergWrite.deleteWhere(spark, s"$base/ord",
      col("o_orderkey") % 10 === 0)
    try dump("routed_agg_masked", graft.sources.Lake.sqlFrame(spark,
      s"""SELECT o_custkey, count(*) AS n, round(sum(o_totalprice), 2) AS s
          FROM '$base/ord' GROUP BY o_custkey"""), withRdd = true)
    catch { case e: Throwable => System.err.println(s"[plans] routed_agg_masked: $e") }

    try dump("routed_composite_pruned", graft.sources.Lake.sqlFrame(spark,
      s"""SELECT o_custkey, count(*) AS n FROM '$base/ord_day'
          WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          GROUP BY o_custkey"""), withRdd = true)
    catch { case e: Throwable => System.err.println(s"[plans] routed_composite_pruned: $e") }

    spark.stop()
  }
}
