package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Fixed-point full-batch GD: learns, is bit-identical across
  * partitionings, and stops early on a zero-gradient step. */
class LinearModelSpec extends SparkSpec {
  import spark.implicits._

  test("trainLogistic learns a separable threshold; bit-identical across partitionings") {
    val df = (0L until 1000L).map(i => (i, if (i >= 500) 1000000L else 0L))
      .toDF("i", "y")
      .withColumn("x", (col("i") - 500L) * 2000L) // micro-units in [-10⁶, 10⁶)
    val w = LinearModel.trainLogistic(df, Seq(col("x")), col("y"), iterations = 5)
    assert(w.length === 1 && w.head > 0L, s"positive weight expected, got $w")
    val w2 = LinearModel.trainLogistic(df.repartition(7), Seq(col("x")), col("y"), 5)
    assert(w2 === w)
  }

  test("a zero-gradient step ends training early: no wasted sequential jobs") {
    // |err·x| = 500000 → idiv(·, 10⁶) = 0 per row: the integer delta is 0
    // on the very first step, so 500 requested iterations must not issue
    // 500 sequential aggregation jobs
    val df = (0L until 100L).map(i => (i % 2 * 1000000L, 1L)).toDF("y", "x")
    @volatile var jobs = 0
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val w = LinearModel.trainLogistic(df, Seq(col("x")), col("y"), iterations = 500)
      assert(w === Seq(0L))
      Thread.sleep(500) // let the listener bus drain
      assert(jobs < 20, s"early stop should cut 500 iterations to ~1 agg job, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
