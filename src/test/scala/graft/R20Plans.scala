package graft

/** Dump `.explain("formatted")` for the round-20 routed bench additions
  * (rb1–rb4 + shuffled twins, exactly the frames Bench times) into
  * `plans/r20/<name>_<tag>.txt`, plus a FORCED-GRACE SPJ dump carrying
  * the single-pass grace evidence (partition count = n buckets, zero
  * ShuffledRDD). Routed frames' physical story lives below the DataFrame
  * bridge (ExistingRDD), so the RDD lineage is appended like R19Plans.
  * Run: `tools/run_probe.sh graft.R20Plans <tag>`. */
object R20Plans {
  def main(args: Array[String]): Unit = {
    val tag = args.headOption.getOrElse("after")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.create("local[8]")
    val outDir = java.nio.file.Paths.get("plans/r20")
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
        withRdd: Boolean): Unit = {
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      val rdd = if (!withRdd) "" else {
        val r = df.queryExecution.toRdd
        s"\n== RDD lineage (toDebugString, numPartitions=${r.getNumPartitions}) ==\n" +
          r.toDebugString + "\n"
      }
      java.nio.file.Files.write(outDir.resolve(s"${name}_$tag.txt"),
        (plan + rdd).getBytes("UTF-8"))
      println(s"[plans] wrote ${name}_$tag.txt")
    }

    queries.BenchLakeQueries.routed.foreach { q =>
      try dump(q.name, q.build(spark, benchDir), withRdd = !q.name.contains("b_"))
      catch { case e: Throwable =>
        System.err.println(s"[plans] ${q.name} failed: ${e.getMessage}")
      }
    }

    // forced-grace SPJ over the bench lake tables: budget ≈ a third of the
    // largest right bucket → every bucket splits k≈3 — the single-pass
    // evidence is numPartitions == 16 (one per bucket; the old design
    // planned ~48) with zero ShuffledRDD
    try {
      val root = queries.BenchLakeQueries.ensure(spark, benchDir)
      val maxBucket = graft.sources.Lake
        .bucketLayoutMoR(spark, s"$root/cust", "c_custkey")
        .get._2.values.map(_.map(_._2).sum).max
      dump("grace_spj_k3", graft.operators.BucketedJoin.coBucketedJoin(
        spark, s"$root/ord", s"$root/cust", "o_custkey",
        rightKey = "c_custkey", buildBudgetBytes = math.max(1L, maxBucket / 3)),
        withRdd = true)
    } catch { case e: Throwable =>
      System.err.println(s"[plans] grace_spj_k3 failed: ${e.getMessage}")
    }
    spark.stop()
  }
}
