package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.catalyst.InternalRow

/** [[BucketedJoin.parallelChunks]] hardening (round 20): bounded waits
  * (a wedged build fails the route loudly instead of parking the query
  * thread forever) and the reentrancy guard (nested use runs inline — a
  * build closure awaiting the shared fixed pool from one of its own
  * threads could deadlock with every thread parked on an outer await). */
class ChunkBuildSpec extends SparkSpec {

  private def emptyRdd: org.apache.spark.rdd.RDD[InternalRow] =
    spark.sparkContext.parallelize(Seq.empty[InternalRow], 1)

  test("a wedged chunk build times out loudly instead of blocking forever") {
    spark.conf.set("graft.route.chunkBuildTimeoutSec", "1")
    try {
      val e = intercept[IllegalArgumentException] {
        BucketedJoin.parallelChunks(spark, Seq(1, 2)) { i =>
          if (i == 2) Thread.sleep(30000L)
          emptyRdd
        }
      }
      assert(e.getMessage.contains("chunkBuildTimeoutSec"), e.getMessage)
    } finally spark.conf.unset("graft.route.chunkBuildTimeoutSec")
  }

  test("reentrant parallelChunks runs inline and completes") {
    // enough nested fan-out to exhaust the shared pool if the inner calls
    // awaited it (outer tasks would hold every thread)
    val poolCap = math.max(2, math.min(16, Runtime.getRuntime.availableProcessors / 2))
    val done = new java.util.concurrent.atomic.AtomicInteger(0)
    val out = BucketedJoin.parallelChunks(spark, 0 until (poolCap + 2)) { _ =>
      val inner = BucketedJoin.parallelChunks(spark, Seq(10, 11, 12)) { _ =>
        done.incrementAndGet(); emptyRdd
      }
      assert(inner.length === 3)
      emptyRdd
    }
    assert(out.length === poolCap + 2)
    assert(done.get() === 3 * (poolCap + 2))
  }

  test("chunk builds run under the caller's job group") {
    val sc = spark.sparkContext
    sc.setJobGroup("graft-test-group", "chunk-build props", false)
    try {
      val seen = BucketedJoin.parallelChunks(spark, Seq(1, 2, 3)) { _ =>
        val g = sc.getLocalProperty("spark.jobGroup.id")
        assert(g === "graft-test-group", s"pool thread saw job group '$g'")
        emptyRdd
      }
      assert(seen.length === 3)
    } finally sc.clearJobGroup()
  }
}
