package graft

/** Diagnostic: splits each bench query's wall time into plan (build +
  * analysis + codegen, paid on first collect of a fresh DataFrame) vs
  * steady-state execution (repeat collect on the SAME DataFrame, which
  * reuses the cached QueryExecution). Run manually; not part of the suite.
  */
object BenchProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    val suite = queries.BenchQueries.headline
    (1 to 2).foreach(_ => suite.foreach(q => q.build(spark, sfDir).collect()))
    System.gc()

    def trimmed(runs: Seq[Double]): Double = runs.sorted.apply(2)
    def t9(f: => Unit): Double = trimmed((1 to 9).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    })

    println(f"${"query"}%-18s ${"build"}%8s ${"analyze"}%8s ${"optimize"}%8s ${"physical"}%8s ${"toRdd"}%8s ${"exec"}%8s ${"fresh"}%8s")
    suite.foreach { q =>
      val build = t9(q.build(spark, sfDir))
      val analyze = t9(q.build(spark, sfDir).queryExecution.analyzed)
      val optimize = t9(q.build(spark, sfDir).queryExecution.optimizedPlan)
      val physical = t9(q.build(spark, sfDir).queryExecution.executedPlan)
      val toRdd = t9(q.build(spark, sfDir).queryExecution.toRdd)
      val fresh = t9(q.build(spark, sfDir).collect())
      val df = q.build(spark, sfDir); df.collect()
      val exec = t9(df.collect())
      println(f"${q.name}%-18s ${build * 1000}%7.1fms ${analyze * 1000}%7.1fms ${optimize * 1000}%7.1fms ${physical * 1000}%7.1fms ${toRdd * 1000}%7.1fms ${exec * 1000}%7.1fms ${fresh * 1000}%7.1fms")
    }
    spark.stop()
  }
}
