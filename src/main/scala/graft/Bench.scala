package graft
import org.apache.spark.sql.SparkSession

/** Headline bench (B1–B15) vs BASELINE.md. One warmed shared session,
  * 1 warm-up + median of 5 timed runs per query (the baseline was measured
  * the same way), results fully materialized via collect().
  * Prints exactly one JSON line.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.builder(s"local[$cpus]")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val suite = queries.BenchQueries.headline
    // Warm-up ×2: JIT, codegen cache, file-footer cache; one GC to clear
    // the warm-up debt before any timed window.
    (1 to 2).foreach(_ => suite.foreach(q => q.build(spark, sfDir).collect()))
    System.gc()

    val timed = suite.map { q =>
      val runs = (1 to 7).map { _ =>
        val t0 = System.nanoTime()
        q.build(spark, sfDir).collect()
        (System.nanoTime() - t0) / 1e9
      }.sorted
      q.name -> runs(runs.size / 2)
    }
    val qs = timed.map { case (k, v) => "\"" + k + "\":" + f"$v%.4f" }.mkString("{", ",", "}")
    val total = timed.map(_._2).sum
    println(f"""{"metric":"suite_total","value":$total%.4f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
