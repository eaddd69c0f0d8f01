package graft

import org.apache.spark.sql.functions._

/** Bucketing (SURVEY.md §4.2 / 100 TB co-location): two tables bucketed on
  * the join key join WITHOUT a shuffle — the physical plan must contain no
  * Exchange on the join path. This is the pre-partitioning story for
  * repeated big-big joins at scale. */
class BucketingSpec extends SparkSpec {

  test("joins between co-bucketed tables run shuffle-free") {
    // default warehouse dir (./spark-warehouse, gitignored) — the conf is
    // static and cannot be set on a live session. DROP only clears the
    // in-memory catalog; stale locations from previous JVMs must go too.
    Seq("b_orders", "b_customer").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(s"spark-warehouse/$t")
      if (loc.exists()) {
        import scala.reflect.io.Directory
        new Directory(loc).deleteRecursively()
      }
    }

    Tables(spark, sf001, "orders")
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_orders")
    Tables(spark, sf001, "customer")
      .withColumn("o_custkey", col("c_custkey"))
      .write.bucketBy(8, "o_custkey").sortBy("o_custkey")
      .mode("overwrite").saveAsTable("b_customer")

    // disable auto-broadcast so the join would otherwise need a shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("b_orders")
        .join(spark.table("b_customer"), "o_custkey")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"), plan.take(800))
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(plan.contains("SelectedBucketsCount"), plan.take(2000))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "4m")
  }
}
