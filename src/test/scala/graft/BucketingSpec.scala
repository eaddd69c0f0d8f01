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

  test("co-bucketed ICEBERG tables join shuffle-free and match the shuffled twin") {
    import graft.operators.BucketedJoin
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
    IcebergWrite.append(spark, orders, s"$root/orders",
      partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, customer, s"$root/customer",
      partitionBy = Seq("bucket(8, o_custkey)"))

    assert(BucketedJoin.coBucketed(spark, s"$root/orders", s"$root/customer",
      "o_custkey"))
    val joined = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey")
    // the whole lineage is narrow: no ShuffledRDD anywhere below the join
    val lineage = joined.rdd.toDebugString
    assert(!lineage.contains("ShuffledRDD"), lineage.take(2000))
    assert(joined.rdd.getNumPartitions === 8)

    // result set identical to the ordinary shuffled join
    val expected = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"), "o_custkey")
      .select(joined.columns.map(col): _*)
    assert(joined.count() === expected.count())
    assert(joined.exceptAll(expected).isEmpty && expected.exceptAll(joined).isEmpty)

    // SQL surface: the bucket_join TVF plans the same shuffle-free shape
    // — through sqlFrame (ref-less SELECTs delegate whole to Spark, TVFs
    // registered on first use)
    val viaSql = Lake.sqlFrame(spark,
      s"""SELECT count(*) AS cnt, round(sum(o_totalprice * c_acctbal), 2) AS x
          FROM bucket_join('$root/orders', '$root/customer', 'o_custkey')""")
      .collect().head
    val exp = expected.agg(count(lit(1)), round(sum(col("o_totalprice") * col("c_acctbal")), 2))
      .collect().head
    assert(viaSql.getLong(0) === exp.getLong(0))
    assert(math.abs(viaSql.getDouble(1) - exp.getDouble(1)) < 1e-6)

    // left / semi / anti are the same bucket-local decision, still 0-shuffle
    val l = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey", "left")
    val lExp = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"), Seq("o_custkey"), "left")
      .select(l.columns.map(col): _*)
    assert(!l.rdd.toDebugString.contains("ShuffledRDD"))
    assert(l.count() === lExp.count())
    assert(l.exceptAll(lExp).isEmpty && lExp.exceptAll(l).isEmpty)
    val semi = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey", "left_semi")
    val anti = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey", "left_anti")
    val nOrders = IcebergRead.snapshot(spark, s"$root/orders").count()
    assert(semi.count() + anti.count() === nOrders)
    assert(semi.columns.toSeq ===
      IcebergRead.snapshot(spark, s"$root/orders").columns.toSeq)
    val semiExp = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"), Seq("o_custkey"), "left_semi")
    assert(semi.count() === semiExp.count())

    // PURE-SQL round trip: CREATE bucketed tables by DDL, INSERT, join
    // through the TVF — the whole SPJ story without touching the API
    val sqlRoot = java.nio.file.Files.createTempDirectory("graft_spj_sql").toString
    Lake.sql(spark, s"""CREATE TABLE '$sqlRoot/a' (id BIGINT, v DOUBLE)
        USING iceberg PARTITIONED BY (bucket(4, id))""")
    Lake.sql(spark, s"""CREATE TABLE '$sqlRoot/b' (id BIGINT, w DOUBLE)
        USING iceberg PARTITIONED BY (bucket(4, id))""")
    Lake.sql(spark, s"INSERT INTO '$sqlRoot/a' SELECT id, id * 1.0 AS v FROM range(1000)")
    Lake.sql(spark, s"INSERT INTO '$sqlRoot/b' SELECT id, id * 2.0 AS w FROM range(500)")
    val viaDdl = Lake.sqlFrame(spark,
      s"""SELECT count(*) AS c, round(sum(v + w), 2) AS s
          FROM bucket_join('$sqlRoot/a', '$sqlRoot/b', 'id')""").collect().head
    assert(viaDdl.getLong(0) === 500L)
    assert(viaDdl.getDouble(1) === (0L until 500L).map(i => i * 3.0).sum)
    // transform partitioning is Iceberg-only in the DDL
    intercept[IllegalArgumentException](Lake.sql(spark,
      s"""CREATE TABLE '$sqlRoot/d' (id BIGINT) USING delta
          PARTITIONED BY (bucket(4, id))"""))

    // guards: unequal n and deleted rows both refuse (fall back to shuffle)
    IcebergWrite.append(spark, customer, s"$root/cust4",
      partitionBy = Seq("bucket(4, o_custkey)"))
    intercept[IllegalArgumentException](BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/cust4", "o_custkey"))
    IcebergWrite.deleteWhere(spark, s"$root/customer", col("o_custkey") === 1L)
    assert(!BucketedJoin.coBucketed(spark, s"$root/orders", s"$root/customer",
      "o_custkey"))
  }
}
