package graft

/** Ad-hoc: time each L/T query at sf0.1 to find scaling outliers.
  * Run: sbt "Test/runMain graft.ScaleProbe" (not part of the suite). */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.create()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = "/root/testdata/sf0.1"
    val names = args.toSeq match {
      case Nil => Registry.all.map(_.name)
      case xs  => xs
    }
    names.foreach { n =>
      val t0 = System.nanoTime()
      try {
        val cnt = Registry.byName(n).build(spark, sf).count()
        println(f"PROBE $n: ${(System.nanoTime() - t0) / 1e9}%.1fs rows=$cnt")
      } catch {
        case e: Exception => println(s"PROBE $n: FAILED ${e.getMessage.take(120)}")
      }
    }
    spark.stop()
  }
}
