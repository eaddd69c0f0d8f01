package graft

import org.apache.spark.sql.functions._

/** Measurement probe for the delegated-SQL per-alias file-stats pruning
  * tier (SCALING.md round-14 table): builds range-clustered Delta tables
  * from sf0.1 lineitem/orders (64/32 files with disjoint l_orderkey /
  * o_orderkey ranges — the layout OPTIMIZE ZORDER/HILBERT maintains in
  * production), then runs the SAME two-path join as statement text (per
  * side WHERE conjuncts → scanPruned views) and as unpruned API reads,
  * reporting files opened and wall time. Run:
  * `sbt "Test/runMain graft.LakePruneCurve"`. */
object LakePruneCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_prunecurve").toString
    val li = s"$base/lineitem"
    val ord = s"$base/orders"
    graft.sources.DeltaWrite.append(spark,
      Tables(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        .repartitionByRange(64, col("l_orderkey"))
        .sortWithinPartitions(col("l_orderkey")), li)
    graft.sources.DeltaWrite.append(spark,
      Tables(spark, sfDir, "orders")
        .select(col("o_orderkey"), col("o_orderdate"))
        .repartitionByRange(32, col("o_orderkey"))
        .sortWithinPartitions(col("o_orderkey")), ord)
    val maxKey = graft.sources.Lake.read(spark, li)
      .agg(max(col("l_orderkey"))).collect()(0).getLong(0)
    val totalFiles = graft.sources.Lake.read(spark, li).inputFiles.length +
      graft.sources.Lake.read(spark, ord).inputFiles.length

    for (frac <- Seq(8, 4, 2)) {
      val cut = maxKey - maxKey / frac
      val stmt =
        s"""SELECT count(*) AS c, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
            FROM '$li' l JOIN '$ord' o ON l.l_orderkey = o.o_orderkey
            WHERE l.l_orderkey >= $cut AND o.o_orderkey >= $cut
            GROUP BY l.l_orderkey >= $cut"""
      // warm + timed statement-text run (per-alias pruned scans)
      graft.sources.Lake.sqlFrame(spark, stmt).collect()
      val t0 = System.nanoTime()
      val pruned = graft.sources.Lake.sqlFrame(spark, stmt)
      val tBuild = (System.nanoTime() - t0) / 1e6
      val r1 = pruned.collect()(0)
      val tPruned = (System.nanoTime() - t0) / 1e6
      println(f"[prune-curve]   build $tBuild%.0f ms of $tPruned%.0f ms total")
      val prunedFiles = pruned.inputFiles.length
      // unpruned API twin: full scans, identical filter/join/agg
      def apiRun() = {
        val l = graft.sources.Lake.read(spark, li).where(col("l_orderkey") >= cut)
        val o = graft.sources.Lake.read(spark, ord).where(col("o_orderkey") >= cut)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .agg(count(lit(1)).as("c"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
      }
      apiRun().collect()
      val t1 = System.nanoTime()
      val r2 = apiRun().collect()(0)
      val tFull = (System.nanoTime() - t1) / 1e6
      require(r1.getLong(0) == r2.getLong(0) && r1.getDouble(1) == r2.getDouble(1),
        s"pruned/unpruned divergence: $r1 vs $r2")
      println(f"[prune-curve] top-1/$frac%d: files $prunedFiles%d/$totalFiles%d, " +
        f"stmt(pruned) $tPruned%.0f ms vs api(full-scan) $tFull%.0f ms, rows=${r1.getLong(0)}%d")
    }

    // JOIN-DERIVED tier (round 15): the filter sits ONLY on the dim side
    // (orders) — lineitem has no conjunct of its own, so per-alias pruning
    // cannot touch it; only the dim's join-key min/max fed through the
    // fact's file stats can. Files opened on the FACT side is the claim.
    val liFiles = graft.sources.Lake.read(spark, li).inputFiles.length
    for (frac <- Seq(8, 4, 2)) {
      val cut = maxKey - maxKey / frac
      val stmt =
        s"""SELECT count(*) AS c, round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS rev
            FROM '$li' l JOIN '$ord' o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderkey >= $cut
            GROUP BY o.o_orderkey >= $cut"""
      graft.sources.Lake.sqlFrame(spark, stmt).collect() // warm
      val t0 = System.nanoTime()
      val pruned = graft.sources.Lake.sqlFrame(spark, stmt)
      val r1 = pruned.collect()(0)
      val tPruned = (System.nanoTime() - t0) / 1e6
      val factOpened = pruned.inputFiles.count(_.contains("/lineitem/"))
      def apiRun() = {
        val l = graft.sources.Lake.read(spark, li)
        val o = graft.sources.Lake.read(spark, ord).where(col("o_orderkey") >= cut)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .agg(count(lit(1)).as("c"),
            round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("rev"))
      }
      apiRun().collect()
      val t1 = System.nanoTime()
      val r2 = apiRun().collect()(0)
      val tFull = (System.nanoTime() - t1) / 1e6
      require(r1.getLong(0) == r2.getLong(0) && r1.getDouble(1) == r2.getDouble(1),
        s"join-derived pruned/unpruned divergence: $r1 vs $r2")
      println(f"[prune-curve-jd] dim top-1/$frac%d: fact files $factOpened%d/$liFiles%d, " +
        f"stmt $tPruned%.0f ms vs api(full-fact-scan) $tFull%.0f ms, rows=${r1.getLong(0)}%d")
    }
    spark.stop()
  }
}
