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
    // bucket(n, col) is the one Delta transform (S8bk); day() still refuses
    intercept[IllegalArgumentException](Lake.sql(spark,
      s"""CREATE TABLE '$sqlRoot/d' (id BIGINT, ts TIMESTAMP) USING delta
          PARTITIONED BY (day(ts))"""))

    // guards: unequal n refuses (fall back to shuffle); a merge-on-read
    // DELETE no longer does (r19) — the position-delete mask applies
    // inside the bucket-local scans and the join stays exact
    IcebergWrite.append(spark, customer, s"$root/cust4",
      partitionBy = Seq("bucket(4, o_custkey)"))
    intercept[IllegalArgumentException](BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/cust4", "o_custkey"))
    IcebergWrite.deleteWhere(spark, s"$root/customer", col("o_custkey") === 1L)
    assert(BucketedJoin.coBucketed(spark, s"$root/orders", s"$root/customer",
      "o_custkey"))
    val afterDel = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey")
    assert(!afterDel.rdd.toDebugString.contains("ShuffledRDD"))
    assert(afterDel.where(col("o_custkey") === 1L).count() === 0)
    val delTwin = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"), "o_custkey")
      .select(afterDel.columns.map(col): _*)
    assert(afterDel.count() === delTwin.count())
  }

  test("bucket join prunes columns + pushes predicates into per-bucket scans; residual + skew split stay exact") {
    import graft.operators.BucketedJoin
    import graft.sources.{IcebergRead, IcebergWrite}
    val root = java.nio.file.Files.createTempDirectory("graft_spj_prune").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"), col("c_mktsegment"))
    IcebergWrite.append(spark, orders, s"$root/orders",
      partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, customer, s"$root/customer",
      partitionBy = Seq("bucket(8, o_custkey)"))

    // the per-bucket scan really shrinks: ReadSchema carries only the read
    // layout and the side predicate reaches PushedFilters
    val layout = IcebergRead.bucketLayoutSized(spark, s"$root/orders", "o_custkey").get
    val files = layout._2.values.flatten.toSeq
    val full = IcebergRead.snapshot(spark, s"$root/orders").schema
    val read = org.apache.spark.sql.types.StructType(
      Seq(full("o_custkey"), full("o_totalprice")))
    val scan = BucketedJoin.bucketScan(spark, full, read,
      Some(col("o_totalprice") > 1000.0), files)
    val plan = scan.queryExecution.executedPlan.toString
    val readSchema = plan.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("o_custkey") && readSchema.contains("o_totalprice"),
      readSchema)
    assert(!readSchema.contains("o_orderstatus") && !readSchema.contains("o_orderpriority"),
      s"scan still reads unprojected columns: $readSchema")
    assert(plan.contains("PushedFilters: [IsNotNull(o_totalprice), GreaterThan(o_totalprice"),
      plan.take(2000))

    // pruned + pushed-down join: equal to the shuffled twin on the same
    // projection/filter; lineage still shuffle-free
    val pruned = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey",
      leftCols = Seq("o_custkey", "o_totalprice"),
      rightCols = Seq("c_mktsegment"),
      leftWhere = Some(col("o_totalprice") > 1000.0),
      rightWhere = Some(col("c_acctbal") > 0.0))
    assert(pruned.columns.toSeq === Seq("o_custkey", "o_totalprice", "c_mktsegment"))
    assert(!pruned.rdd.toDebugString.contains("ShuffledRDD"))
    val twin = IcebergRead.snapshot(spark, s"$root/orders")
      .where(col("o_totalprice") > 1000.0)
      .join(IcebergRead.snapshot(spark, s"$root/customer")
        .where(col("c_acctbal") > 0.0), "o_custkey")
      .select(col("o_custkey"), col("o_totalprice"), col("c_mktsegment"))
    assert(pruned.count() === twin.count())
    assert(pruned.exceptAll(twin).isEmpty && twin.exceptAll(pruned).isEmpty)

    // residual ON conjunct: exact ON semantics for inner AND left outer
    // (a residual-failing pair must NULL-FILL on the left join, which a
    // post-join filter gets wrong)
    val res = col("o_totalprice") > col("c_acctbal")
    for (jt <- Seq("inner", "left")) {
      val viaSpj = BucketedJoin.coBucketedJoin(spark,
        s"$root/orders", s"$root/customer", "o_custkey", jt,
        leftCols = Seq("o_custkey", "o_totalprice"),
        rightCols = Seq("c_acctbal"),
        residual = Some(res))
      val l = IcebergRead.snapshot(spark, s"$root/orders")
        .select(col("o_custkey"), col("o_totalprice"))
      val r = IcebergRead.snapshot(spark, s"$root/customer")
        .select(col("o_custkey").as("rk"), col("c_acctbal"))
      val viaSpark = l.join(r, l("o_custkey") === r("rk") && res,
          if (jt == "inner") "inner" else "left")
        .select(col("o_custkey"), col("o_totalprice"), col("c_acctbal"))
      assert(viaSpj.count() === viaSpark.count(), jt)
      assert(viaSpj.exceptAll(viaSpark).isEmpty &&
        viaSpark.exceptAll(viaSpj).isEmpty, jt)
    }
    // semi/anti with residual partition the left side exactly
    val semiR = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey", "left_semi",
      residual = Some(res))
    val antiR = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey", "left_anti",
      residual = Some(res))
    val lAll = IcebergRead.snapshot(spark, s"$root/orders")
    assert(semiR.count() + antiR.count() === lAll.count())
    val rr = IcebergRead.snapshot(spark, s"$root/customer")
      .select(col("o_custkey").as("rk"), col("c_acctbal"))
    val semiExp = lAll.join(rr, lAll("o_custkey") === rr("rk") && res, "left_semi")
    assert(semiR.count() === semiExp.count())

    // TVF surface: projection + pushdown args compose (before the skew
    // append below — `twin` pinned this snapshot's file list)
    val viaTvf = graft.sources.Lake.sqlFrame(spark,
      s"""SELECT count(*) AS cnt, round(sum(o_totalprice), 2) AS s
          FROM bucket_join('$root/orders', '$root/customer', 'o_custkey',
            'inner', 'o_custkey,o_totalprice', 'c_mktsegment',
            'o_totalprice > 1000.0', 'c_acctbal > 0.0')""").collect().head
    val expTvf = twin.agg(count(lit(1)), round(sum(col("o_totalprice")), 2)).collect().head
    assert(viaTvf.getLong(0) === expTvf.getLong(0))
    assert(math.abs(viaTvf.getDouble(1) - expTvf.getDouble(1)) < 1e-6)

    // SKEW SPLIT: a second append gives every bucket ≥2 files; a tiny
    // byte threshold then forces multi-chunk buckets — strictly more
    // partitions than buckets, zero shuffles, identical result
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 0)
      .withColumn("o_orderkey", col("o_orderkey") + 100000000L),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    val split = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey",
      splitBucketBytes = 1L) // every multi-file bucket splits
    val baseline = BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey")
    assert(!split.rdd.toDebugString.contains("ShuffledRDD"))
    assert(split.rdd.getNumPartitions > baseline.rdd.getNumPartitions,
      s"${split.rdd.getNumPartitions} vs ${baseline.rdd.getNumPartitions}")
    assert(split.count() === baseline.count())
    assert(split.exceptAll(baseline).isEmpty && baseline.exceptAll(split).isEmpty)
  }

  test("plain delegated SQL auto-routes a co-bucketed equi-join through the SPJ reader") {
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj_auto").toString
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus")),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_acctbal"), col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, o_custkey)"))

    val stmt = s"""SELECT c.c_mktsegment, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS revenue
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.o_custkey
      WHERE o.o_totalprice > 1000.0 AND c.c_acctbal > 0.0
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
    val routed = Lake.sqlFrame(spark, stmt)
    // (a) the JOIN is gone from the Spark plan — it happened inside the
    // co-partitioned reader (an ExistingRDD scan); only the agg shuffles
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin") &&
      !plan.contains("ShuffledHashJoin"), plan.take(2000))
    // (b) the routed subtree carries exactly the referenced columns — read
    // off the embedded LogicalRDD (the temp view itself is DROPPED right
    // after the plan materializes, so the session catalog stays clean)
    val rddCols = routed.queryExecution.analyzed.collect {
      case l if l.getClass.getSimpleName == "LogicalRDD" =>
        l.output.map(_.name).toSet
    }
    assert(rddCols.exists(_ == Set("o_custkey", "o_totalprice", "c_acctbal", "c_mktsegment")),
      rddCols.mkString("; "))
    assert(!spark.catalog.listTables().collect().map(_.name)
      .exists(_.startsWith("graft_spj_")), "routed temp view must be dropped")
    // result identical to the shuffled twin
    val twin = IcebergRead.snapshot(spark, s"$root/orders").as("o")
      .where(col("o_totalprice") > 1000.0)
      .join(IcebergRead.snapshot(spark, s"$root/customer").as("c")
        .where(col("c_acctbal") > 0.0), "o_custkey")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
    assert(routed.collect().toSeq === twin.collect().toSeq)

    // residual ON conjunct rides bucket-locally, same result as Spark
    val res = Lake.sqlFrame(spark, s"""SELECT count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c
        ON o.o_custkey = c.o_custkey AND o.o_totalprice > c.c_acctbal""")
    assert(!res.queryExecution.executedPlan.toString.contains("Join"))
    val resTwin = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer")
        .withColumnRenamed("o_custkey", "ck")
        .withColumnRenamed("c_acctbal", "ab"),
        col("o_custkey") === col("ck") && col("o_totalprice") > col("ab"))
      .count()
    assert(res.collect().head.getLong(0) === resTwin)

    // refusal shapes fall back to the ordinary (joined) delegated plan,
    // still correct: LEFT JOIN, SELECT *, a subquery, an alias.* star
    val leftStmt = s"""SELECT count(*) AS cnt
      FROM '$root/orders' o LEFT JOIN '$root/customer' c ON o.o_custkey = c.o_custkey"""
    val leftDf = Lake.sqlFrame(spark, leftStmt)
    assert(leftDf.queryExecution.executedPlan.toString.contains("Join"))
    assert(leftDf.collect().head.getLong(0) ===
      IcebergRead.snapshot(spark, s"$root/orders").count())
    val starDf = Lake.sqlFrame(spark, s"""SELECT * FROM '$root/orders' o
      JOIN '$root/customer' c ON o.o_custkey = c.o_custkey LIMIT 5""")
    assert(starDf.queryExecution.executedPlan.toString.contains("Join"))
    assert(starDf.columns.count(_ == "o_custkey") === 2) // both keys, as Spark would
    val subqDf = Lake.sqlFrame(spark, s"""SELECT count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.o_custkey
      WHERE o.o_totalprice > (SELECT avg(o_totalprice) FROM '$root/orders')""")
    assert(subqDf.queryExecution.executedPlan.toString.contains("Join"))
    assert(subqDf.collect().head.getLong(0) > 0L)
  }

  test("bucket-local aggregation: GROUP BY the bucket key runs exchange-free, equal to the shuffled twin") {
    import graft.operators.BucketedAgg
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_bagg").toString
    // two appends: multiple files per bucket, a key's rows still live in
    // exactly one bucket — the complete per-bucket agg stays exact
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderstatus"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 0),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 1),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))

    assert(BucketedAgg.canAggLocally(spark, s"$root/t", "o_custkey", Seq("o_custkey")))
    val local = BucketedAgg.bucketLocalAgg(spark, s"$root/t", "o_custkey",
      Seq("o_custkey"),
      Seq(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("s"),
        min(col("o_orderkey")).as("mn"), avg(col("o_totalprice")).as("a")))
    // zero exchange anywhere below
    assert(!local.rdd.toDebugString.contains("ShuffledRDD"),
      local.rdd.toDebugString.take(2000))
    assert(local.rdd.getNumPartitions === 8)
    val twin = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("s"),
        min(col("o_orderkey")).as("mn"), avg(col("o_totalprice")).as("a"))
    assert(local.count() === twin.count())
    // double sums accumulate in a different order than the shuffled
    // partial/final merge — compare numerically, not bit-exactly
    val lRows = local.orderBy(col("o_custkey")).collect()
    val tRows = twin.orderBy(col("o_custkey")).collect()
    lRows.zip(tRows).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(1) === b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-6)
      assert(a.getLong(3) === b.getLong(3))
      assert(math.abs(a.getDouble(4) - b.getDouble(4)) < 1e-9)
    }

    // multi-column grouping (key + another col) and a pushed-down WHERE
    val local2 = BucketedAgg.bucketLocalAgg(spark, s"$root/t", "o_custkey",
      Seq("o_custkey", "o_orderstatus"), Seq(count(lit(1)).as("cnt")),
      where = Some(col("o_totalprice") > 1000.0))
    val twin2 = IcebergRead.snapshot(spark, s"$root/t")
      .where(col("o_totalprice") > 1000.0)
      .groupBy(col("o_custkey"), col("o_orderstatus"))
      .agg(count(lit(1)).as("cnt"))
    assert(!local2.rdd.toDebugString.contains("ShuffledRDD"))
    assert(local2.exceptAll(twin2).isEmpty && twin2.exceptAll(local2).isEmpty)

    // SQL surface: the bucket_agg TVF plans the same shape
    val viaSql = Lake.sqlFrame(spark,
      s"""SELECT * FROM bucket_agg('$root/t', 'o_custkey', 'o_custkey',
            'count(*) AS cnt, round(sum(o_totalprice), 2) AS s',
            'o_totalprice > 1000.0')
          ORDER BY o_custkey LIMIT 10""")
    val twinSql = IcebergRead.snapshot(spark, s"$root/t")
      .where(col("o_totalprice") > 1000.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("s"))
      .orderBy(col("o_custkey")).limit(10)
    assert(viaSql.collect().toSeq === twinSql.collect().toSeq)

    // guards: grouping without the key, non-bucketed table
    intercept[IllegalArgumentException](BucketedAgg.bucketLocalAgg(spark,
      s"$root/t", "o_custkey", Seq("o_orderstatus"), Seq(count(lit(1)).as("c"))))
    intercept[IllegalArgumentException](BucketedAgg.bucketLocalAgg(spark,
      s"$root/t", "o_orderkey", Seq("o_orderkey"), Seq(count(lit(1)).as("c"))))

    // DISTINCT aggregates are bucket-local EXACT (a group lives in one
    // bucket) — mixed with plain aggregates in one call, still 0-shuffle
    val cd = BucketedAgg.bucketLocalAgg(spark, s"$root/t", "o_custkey",
      Seq("o_custkey"),
      Seq(countDistinct(col("o_orderstatus")).as("d"), count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("s")))
    assert(!cd.rdd.toDebugString.contains("ShuffledRDD"))
    val cdTwin = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderstatus")).as("d"), count(lit(1)).as("n"),
        sum(col("o_orderkey")).as("s"))
    assert(cd.exceptAll(cdTwin).isEmpty && cdTwin.exceptAll(cd).isEmpty)
  }

  test("plain delegated SQL auto-routes a bucket-key GROUP BY through the local aggregation") {
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_bagg_auto").toString
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice"), col("o_orderstatus")),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))

    val stmt = s"""SELECT t.o_custkey, count(*) AS cnt,
        round(sum(t.o_totalprice), 2) AS total
      FROM '$root/t' t WHERE t.o_totalprice > 500.0
      GROUP BY t.o_custkey ORDER BY t.o_custkey LIMIT 20"""
    val routed = Lake.sqlFrame(spark, stmt)
    // the aggregation happened inside the co-partitioned reader: the plan
    // scans an ExistingRDD and carries NO HashAggregate/Exchange pair for
    // the rollup (the outer ORDER/LIMIT is a TakeOrdered, no exchange)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan.take(1500))
    assert(!plan.contains("HashAggregate"), plan.take(2000))
    val twin = IcebergRead.snapshot(spark, s"$root/t")
      .where(col("o_totalprice") > 500.0)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
      .orderBy(col("o_custkey")).limit(20)
    assert(routed.collect().toSeq === twin.collect().toSeq)

    // refusals fall back to the shuffled agg, still correct: a grouping
    // without the bucket key; an unaliased aggregate
    for (fallback <- Seq(
      s"SELECT o_orderstatus, count(*) AS c FROM '$root/t' GROUP BY o_orderstatus",
      s"SELECT o_custkey, count(*) FROM '$root/t' GROUP BY o_custkey")) {
      val df = Lake.sqlFrame(spark, fallback)
      assert(df.queryExecution.executedPlan.toString.contains("HashAggregate"),
        fallback)
      assert(df.count() > 0, fallback)
    }
    // HAVING routes: the COMPLETE per-bucket aggregation makes it a plain
    // filter over the routed view — no HashAggregate in the plan, even
    // when the HAVING mentions an aggregate ABSENT from the select list
    // (computed as a hidden __hv column and projected away)
    for (stmt <- Seq(
      s"SELECT o_custkey, count(*) AS c FROM '$root/t' GROUP BY o_custkey HAVING count(*) > 1",
      s"SELECT o_custkey, count(*) AS c FROM '$root/t' GROUP BY o_custkey HAVING sum(o_totalprice) > 200000.0")) {
      val routedH = Lake.sqlFrame(spark, stmt)
      val planH = routedH.queryExecution.executedPlan.toString
      assert(planH.contains("ExistingRDD") && !planH.contains("HashAggregate"),
        s"$stmt\n${planH.take(1500)}")
    }
    val hav = Lake.sqlFrame(spark,
      s"SELECT o_custkey, count(*) AS c FROM '$root/t' GROUP BY o_custkey HAVING count(*) > 1")
    val havTwin = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("c"))
      .where(col("c") > 1)
    assert(hav.exceptAll(havTwin).isEmpty && havTwin.exceptAll(hav).isEmpty)
    val hav2 = Lake.sqlFrame(spark,
      s"SELECT o_custkey, count(*) AS c FROM '$root/t' GROUP BY o_custkey HAVING sum(o_totalprice) > 200000.0")
    val hav2Twin = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("c"), sum(col("o_totalprice")).as("__s"))
      .where(col("__s") > 200000.0).drop("__s")
    assert(hav2.exceptAll(hav2Twin).isEmpty && hav2Twin.exceptAll(hav2).isEmpty)
    // a bucket-key count(DISTINCT) routes too — bucket-local exact
    val cdStmt = s"""SELECT o_custkey, count(DISTINCT o_orderstatus) AS d,
        count(*) AS c FROM '$root/t' GROUP BY o_custkey"""
    val cdRouted = Lake.sqlFrame(spark, cdStmt)
    val cdPlan = cdRouted.queryExecution.executedPlan.toString
    assert(cdPlan.contains("ExistingRDD") && !cdPlan.contains("HashAggregate"),
      cdPlan.take(1500))
    val cdTwin = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderstatus")).as("d"), count(lit(1)).as("c"))
    assert(cdRouted.exceptAll(cdTwin).isEmpty && cdTwin.exceptAll(cdRouted).isEmpty)
  }

  test("SPJ + bucket-key GROUP BY fuses: join AND rollup run with zero exchanges") {
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj_fuse").toString
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_acctbal"), col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, o_custkey)"))

    // GROUP BY the JOIN KEY: the rollup can stay bucket-local on top of
    // the zero-shuffle join — the entire plan below ORDER/LIMIT carries
    // neither a Spark join nor a HashAggregate
    val stmt = s"""SELECT o.o_custkey, count(*) AS cnt,
        round(sum(o.o_totalprice * c.c_acctbal), 2) AS x
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.o_custkey
      WHERE o.o_totalprice > 500.0
      GROUP BY o.o_custkey ORDER BY o.o_custkey LIMIT 25"""
    val fused = Lake.sqlFrame(spark, stmt)
    val plan = fused.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan.take(1500))
    assert(!plan.contains("HashAggregate") && !plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(2500))
    val twin = IcebergRead.snapshot(spark, s"$root/orders")
      .where(col("o_totalprice") > 500.0)
      .join(IcebergRead.snapshot(spark, s"$root/customer"), "o_custkey")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"),
        round(sum(col("o_totalprice") * col("c_acctbal")), 2).as("x"))
      .orderBy(col("o_custkey")).limit(25)
    val f = fused.collect()
    val t = twin.collect()
    assert(f.length === t.length)
    f.zip(t).foreach { case (a, b) =>
      assert(a.getLong(0) === b.getLong(0))
      assert(a.getLong(1) === b.getLong(1))
      assert(math.abs(a.getDouble(2) - b.getDouble(2)) < 1e-4,
        s"${a.getDouble(2)} vs ${b.getDouble(2)}")
    }

    // HAVING fuses too: the per-partition rollup is COMPLETE, so the
    // HAVING — even over an aggregate absent from the select list — is a
    // filter over the fused view; still neither a join nor a HashAggregate
    val havStmt = s"""SELECT o.o_custkey, count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.o_custkey
      GROUP BY o.o_custkey HAVING sum(o.o_totalprice) > 200000.0
      ORDER BY o.o_custkey"""
    val havFused = Lake.sqlFrame(spark, havStmt)
    val havPlan = havFused.queryExecution.executedPlan.toString
    assert(havPlan.contains("ExistingRDD") && !havPlan.contains("HashAggregate") &&
      !havPlan.contains("Join"), havPlan.take(2000))
    val havTwin = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"), "o_custkey")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"), sum(col("o_totalprice")).as("__s"))
      .where(col("__s") > 200000.0).drop("__s")
      .orderBy(col("o_custkey"))
    assert(havFused.collect().toSeq === havTwin.collect().toSeq)

    // GROUP BY a NON-key column: the join stays routed, the rollup falls
    // back to the ordinary (shuffled) aggregation — still correct
    val nonKey = Lake.sqlFrame(spark, s"""SELECT c.c_mktsegment, count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.o_custkey
      GROUP BY c.c_mktsegment""")
    val nkPlan = nonKey.queryExecution.executedPlan.toString
    assert(nkPlan.contains("ExistingRDD") && nkPlan.contains("HashAggregate"),
      nkPlan.take(2000))
    val nkTwin = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"), "o_custkey")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
    assert(nonKey.exceptAll(nkTwin).isEmpty && nkTwin.exceptAll(nonKey).isEmpty)
  }

  test("EXPLAIN FILES suppresses the auto-routes and still reports per-table file counts") {
    import graft.sources.{IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj_explain").toString
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey").as("o_custkey"),
        col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, o_custkey)"))
    val stmt = s"""SELECT c.c_mktsegment, count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.o_custkey
      GROUP BY c.c_mktsegment"""
    // the routed execution reads through an opaque RDD — EXPLAIN FILES
    // must still report real opened/total per table (routes suppressed)
    val rows = Lake.sqlFrame(spark, s"EXPLAIN FILES $stmt").collect()
    assert(rows.length === 2, rows.mkString("; "))
    rows.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L, r.toString)
      assert(r.getLong(1) <= r.getLong(2), r.toString)
    }
    // and the statement itself still routes (plan has no Spark join)
    val routed = Lake.sqlFrame(spark, stmt)
    assert(!routed.queryExecution.executedPlan.toString.contains("Join"))
    assert(routed.count() > 0)
  }

  test("bucket-local DISTINCT: SELECT DISTINCT over the bucket key runs exchange-free") {
    import graft.operators.BucketedAgg
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_bdist").toString
    // duplicate rows across two appends: dedup must cross file boundaries
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_custkey"), col("o_orderstatus"))
    IcebergWrite.append(spark, orders, s"$root/t",
      partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, orders.where(col("o_custkey") % 3 === 0),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))

    val local = BucketedAgg.bucketLocalDistinct(spark, s"$root/t",
      "o_custkey", Seq("o_custkey", "o_orderstatus"))
    assert(!local.rdd.toDebugString.contains("ShuffledRDD"))
    val twin = IcebergRead.snapshot(spark, s"$root/t")
      .select(col("o_custkey"), col("o_orderstatus")).distinct()
    assert(local.count() === twin.count())
    assert(local.exceptAll(twin).isEmpty && twin.exceptAll(local).isEmpty)

    // plain SQL: SELECT DISTINCT routes (no HashAggregate in the plan);
    // an aggregate-free GROUP BY routes the same way
    for (stmt <- Seq(
      s"SELECT DISTINCT o_custkey, o_orderstatus FROM '$root/t' ORDER BY o_custkey, o_orderstatus LIMIT 30",
      s"SELECT o_custkey, o_orderstatus FROM '$root/t' GROUP BY o_custkey, o_orderstatus ORDER BY o_custkey, o_orderstatus LIMIT 30")) {
      val routed = Lake.sqlFrame(spark, stmt)
      val plan = routed.queryExecution.executedPlan.toString
      assert(plan.contains("ExistingRDD") && !plan.contains("HashAggregate"),
        s"$stmt\n${plan.take(2000)}")
      val exp = twin.orderBy(col("o_custkey"), col("o_orderstatus")).limit(30)
      assert(routed.collect().toSeq === exp.collect().toSeq, stmt)
    }
    // TVF surface + WHERE pushdown
    val viaTvf = Lake.sqlFrame(spark,
      s"""SELECT count(*) AS c FROM bucket_distinct('$root/t', 'o_custkey',
            'o_custkey,o_orderstatus', 'o_custkey % 2 = 0')""").collect().head
    assert(viaTvf.getLong(0) ===
      twin.where(col("o_custkey") % 2 === 0).count())
    // DISTINCT without the bucket key falls back, still exact
    val fb = Lake.sqlFrame(spark,
      s"SELECT DISTINCT o_orderstatus FROM '$root/t'")
    assert(fb.queryExecution.executedPlan.toString.contains("HashAggregate"))
    assert(fb.count() === twin.select("o_orderstatus").distinct().count())
  }

  test("SPJ joins DIFFERENT key names per side — the natural dimension shape") {
    import graft.operators.BucketedJoin
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj_nat").toString
    // customer keeps its OWN column name — no rename at write time
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey"), col("c_acctbal"),
        col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, c_custkey)"))

    assert(BucketedJoin.coBucketed(spark, s"$root/orders", s"$root/customer",
      "o_custkey", "c_custkey"))
    val joined = BucketedJoin.coBucketedJoin(spark, s"$root/orders",
      s"$root/customer", "o_custkey", rightKey = "c_custkey")
    assert(!joined.rdd.toDebugString.contains("ShuffledRDD"))
    assert(!joined.columns.contains("c_custkey")) // right key drops, like USING
    val twin = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .drop("c_custkey")
      .select(joined.columns.map(col): _*)
    assert(joined.count() === twin.count())
    assert(joined.exceptAll(twin).isEmpty && twin.exceptAll(joined).isEmpty)

    // plain SQL auto-routes the natural ON shape too
    val stmt = s"""SELECT c.c_mktsegment, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS revenue
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice > 1000.0
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
    val routed = Lake.sqlFrame(spark, stmt)
    assert(!routed.queryExecution.executedPlan.toString.contains("Join"))
    val twinAgg = IcebergRead.snapshot(spark, s"$root/orders")
      .where(col("o_totalprice") > 1000.0)
      .join(IcebergRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
    assert(routed.collect().toSeq === twinAgg.collect().toSeq)

    // a statement that SELECTs the right key now ROUTES — distinct names
    // make the explicit selection unambiguous, so the view keeps c_custkey
    val sel = Lake.sqlFrame(spark, s"""SELECT c.c_custkey, count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_custkey ORDER BY c.c_custkey""")
    assert(!sel.queryExecution.executedPlan.toString.contains("Join"))
    val selTwin = IcebergRead.snapshot(spark, s"$root/orders")
      .join(IcebergRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_custkey")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("c_custkey"))
    assert(sel.collect().toSeq === selTwin.collect().toSeq)

    // TVF 'lk=rk' key form
    val viaTvf = Lake.sqlFrame(spark,
      s"""SELECT count(*) AS c FROM bucket_join('$root/orders',
            '$root/customer', 'o_custkey=c_custkey')""").collect().head
    assert(viaTvf.getLong(0) === twin.count())
  }

  test("the SPJ auto-route fires for USE-catalog bare names too") {
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj_use").toString
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey"), col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, c_custkey)"))
    Lake.sql(spark, s"USE '$root'")
    try {
      val routed = Lake.sqlFrame(spark,
        """SELECT customer.c_mktsegment, count(*) AS cnt
           FROM orders JOIN customer ON orders.o_custkey = customer.c_custkey
           GROUP BY customer.c_mktsegment ORDER BY customer.c_mktsegment""")
      assert(!routed.queryExecution.executedPlan.toString.contains("Join"))
      val twin = IcebergRead.snapshot(spark, s"$root/orders")
        .join(IcebergRead.snapshot(spark, s"$root/customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("cnt"))
        .orderBy(col("c_mktsegment"))
      assert(routed.collect().toSeq === twin.collect().toSeq)
      // bare-name bucket-key GROUP BY routes through the local agg too
      val agg = Lake.sqlFrame(spark,
        """SELECT o_custkey, count(*) AS cnt FROM orders
           GROUP BY o_custkey ORDER BY o_custkey LIMIT 10""")
      val aggPlan = agg.queryExecution.executedPlan.toString
      assert(aggPlan.contains("ExistingRDD") && !aggPlan.contains("HashAggregate"),
        aggPlan.take(1500))
      assert(agg.count() === 10)
    } finally Lake.sql(spark, "USE DEFAULT")
  }

  test("review regressions: string aggregates copy buffers; selected right key emits; fused multi-file buckets exact") {
    import graft.operators.{BucketedAgg, BucketedJoin}
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_rr").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    // two appends: multiple files per bucket
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 0),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 1),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))

    // STRING aggregates: the buffered UTF8String must not alias the scan's
    // reused row buffer (pre-fix this returned bytes of arbitrary later rows)
    val sAgg = BucketedAgg.bucketLocalAgg(spark, s"$root/t", "o_custkey",
      Seq("o_custkey"),
      Seq(max(col("o_orderpriority")).as("mx"), min(col("o_orderpriority")).as("mn"),
        first(col("o_orderpriority")).as("f")))
    val sTwin = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey"))
      .agg(max(col("o_orderpriority")).as("mx"), min(col("o_orderpriority")).as("mn"))
    val got = sAgg.select("o_custkey", "mx", "mn").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    val exp = sTwin.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(got === exp)

    // the fused SPJ+agg over MULTI-FILE buckets stays exact: one row per
    // key (a split bucket would emit partial duplicates)
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey"), col("c_acctbal")),
      s"$root/customer", partitionBy = Seq("bucket(8, c_custkey)"))
    val fused = Lake.sqlFrame(spark, s"""SELECT o_custkey, count(*) AS cnt
      FROM '$root/t' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      GROUP BY o_custkey""")
    assert(!fused.queryExecution.executedPlan.toString.contains("HashAggregate"))
    val keys = fused.select("o_custkey").collect().map(_.getLong(0))
    assert(keys.length === keys.distinct.length, "duplicate groups — split leaked into fusion")
    val fTwin = IcebergRead.snapshot(spark, s"$root/t")
      .join(IcebergRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("cnt"))
    assert(fused.exceptAll(fTwin).isEmpty && fTwin.exceptAll(fused).isEmpty)

    // an EXPLICITLY selected right key (distinct names) now emits
    val withRk = BucketedJoin.coBucketedJoin(spark, s"$root/t", s"$root/customer",
      "o_custkey", rightKey = "c_custkey",
      leftCols = Seq("o_custkey", "o_totalprice"),
      rightCols = Seq("c_custkey", "c_acctbal"))
    assert(withRk.columns.toSeq === Seq("o_custkey", "o_totalprice", "c_custkey", "c_acctbal"))
    assert(withRk.where(col("o_custkey") =!= col("c_custkey")).count() === 0L)

    // histogram point fraction: BETWEEN x AND x estimates the bin's mass,
    // never zero (pre-fix a single-day slice broadcast-hinted as empty)
    Lake.sql(spark, s"ANALYZE TABLE '$root/t'")
    val st = Lake.tableStats(spark, s"$root/t").get
    val h = st.hist("o_custkey")
    val mid = (h.lo + h.hi) / 2
    assert(h.fraction(mid, mid) > 0.0)
    assert(h.fraction(mid, mid) <= h.counts.max.toDouble / h.counts.sum + 1e-9)
  }

  test("multi-table SPJ: a 3-table INNER chain routes its co-bucketed pair, dims join the view") {
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spj3").toString
    IcebergWrite.append(spark,
      Tables(spark, sf001, "orders").select(col("o_orderkey"), col("o_custkey"),
        col("o_totalprice")),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey"), col("c_nationkey"),
        col("c_acctbal")),
      s"$root/customer", partitionBy = Seq("bucket(8, c_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "nation").select(col("n_nationkey"), col("n_name")),
      s"$root/nation")

    val twin = IcebergRead.snapshot(spark, s"$root/orders")
      .where(col("o_totalprice") > 1000.0)
      .join(IcebergRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .join(IcebergRead.snapshot(spark, s"$root/nation"),
        col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy(col("n_name"))

    // fact JOIN fact JOIN dim: the co-bucketed pair routes through the
    // SPJ reader (ExistingRDD, no fact-fact exchange); ONLY the dim join
    // remains a Spark join — and it broadcasts
    val stmt = s"""SELECT n.n_name, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS rev
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
        JOIN '$root/nation' n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_totalprice > 1000.0
      GROUP BY n.n_name ORDER BY n.n_name"""
    val routed = Lake.sqlFrame(spark, stmt)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD"), plan.take(1500))
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      plan.take(2500))
    assert(plan.contains("BroadcastHashJoin"), plan.take(2500)) // the dim join only
    assert(routed.collect().toSeq === twin.collect().toSeq)

    // the pair need not be textually adjacent: dim joins first in the
    // text, the fact-fact pair still routes (chain rebuilt around the view)
    val stmt2 = s"""SELECT n.n_name, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS rev
      FROM '$root/customer' c JOIN '$root/nation' n ON c.c_nationkey = n.n_nationkey
        JOIN '$root/orders' o ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice > 1000.0
      GROUP BY n.n_name ORDER BY n.n_name"""
    val routed2 = Lake.sqlFrame(spark, stmt2)
    val plan2 = routed2.queryExecution.executedPlan.toString
    assert(plan2.contains("ExistingRDD"), plan2.take(1500))
    assert(!plan2.contains("SortMergeJoin") && !plan2.contains("ShuffledHashJoin"),
      plan2.take(2500))
    assert(routed2.collect().toSeq === twin.collect().toSeq)

    // an unconnected extra table (would need a cross join) falls back
    // whole — the ordinary delegated plan runs and is still correct
    val cross = Lake.sqlFrame(spark, s"""SELECT count(*) AS c
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
        JOIN '$root/nation' n ON n.n_nationkey >= 0""")
    assert(cross.collect().head.getLong(0) > 0)

    // a plain-PARQUET dimension doesn't forfeit the route: only the pair
    // needs a bucket layout, the parquet dim re-joins the SPJ view
    Tables(spark, sf001, "nation").select(col("n_nationkey"), col("n_name"))
      .write.mode("overwrite").parquet(s"$root/nation_pq")
    val stmtPq = s"""SELECT n.n_name, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS rev
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
        JOIN '$root/nation_pq' n ON c.c_nationkey = n.n_nationkey
      WHERE o.o_totalprice > 1000.0
      GROUP BY n.n_name ORDER BY n.n_name"""
    val routedPq = Lake.sqlFrame(spark, stmtPq)
    val planPq = routedPq.queryExecution.executedPlan.toString
    assert(planPq.contains("ExistingRDD"), planPq.take(1500))
    assert(!planPq.contains("SortMergeJoin") && !planPq.contains("ShuffledHashJoin"),
      planPq.take(2500))
    assert(routedPq.collect().toSeq === twin.collect().toSeq)
  }

  test("zero-exchange routes: forced spill stays exact; memory gates refuse to the shuffled plan") {
    import graft.operators.BucketedAgg
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_spill").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 0),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 1),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark,
      Tables(spark, sf001, "customer").select(col("c_custkey"), col("c_acctbal"),
        col("c_mktsegment")),
      s"$root/customer", partitionBy = Seq("bucket(8, c_custkey)"))

    // FORCED SPILL: a tiny flush threshold makes every bucket write many
    // sorted runs and merge them — results must stay exactly equal to the
    // shuffled twin (incl. string buffers crossing the serialize/merge
    // path and avg's two-slot partial merge), lineage still shuffle-free
    spark.conf.set("graft.local.spillRows", "7")
    try {
      val spilled = BucketedAgg.bucketLocalAgg(spark, s"$root/t", "o_custkey",
        Seq("o_custkey"),
        Seq(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("s"),
          min(col("o_orderpriority")).as("mn"), max(col("o_orderpriority")).as("mx"),
          avg(col("o_totalprice")).as("a")))
      assert(!spilled.rdd.toDebugString.contains("ShuffledRDD"))
      val twin = IcebergRead.snapshot(spark, s"$root/t")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("s"),
          min(col("o_orderpriority")).as("mn"), max(col("o_orderpriority")).as("mx"),
          avg(col("o_totalprice")).as("a"))
      val got = spilled.orderBy(col("o_custkey")).collect()
      val exp = twin.orderBy(col("o_custkey")).collect()
      assert(got.length === exp.length)
      got.zip(exp).foreach { case (a, b) =>
        assert(a.getLong(0) === b.getLong(0))
        assert(a.getLong(1) === b.getLong(1))
        assert(a.getLong(2) === b.getLong(2))
        assert(a.getString(3) === b.getString(3))
        assert(a.getString(4) === b.getString(4))
        assert(math.abs(a.getDouble(5) - b.getDouble(5)) < 1e-9)
      }
      // ALL-FIXED-WIDTH buffers (longs only): spilled records must not
      // alias the serializer's shared backing array — pre-fix every record
      // of a run silently held the LAST group's partials (var-length
      // buffers masked it because their getBytes copies)
      val fixedSpill = BucketedAgg.bucketLocalAgg(spark, s"$root/t",
        "o_custkey", Seq("o_custkey"),
        Seq(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("s")))
      val fixedTwin = IcebergRead.snapshot(spark, s"$root/t")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("cnt"), sum(col("o_orderkey")).as("s"))
      assert(fixedSpill.exceptAll(fixedTwin).isEmpty &&
        fixedTwin.exceptAll(fixedSpill).isEmpty)
      // distinct's flush-and-merge dedups across runs exactly
      val dSpilled = BucketedAgg.bucketLocalDistinct(spark, s"$root/t",
        "o_custkey", Seq("o_custkey", "o_orderpriority"))
      assert(!dSpilled.rdd.toDebugString.contains("ShuffledRDD"))
      val dTwin = IcebergRead.snapshot(spark, s"$root/t")
        .select(col("o_custkey"), col("o_orderpriority")).distinct()
      assert(dSpilled.count() === dTwin.count())
      assert(dSpilled.exceptAll(dTwin).isEmpty && dTwin.exceptAll(dSpilled).isEmpty)
    } finally spark.conf.unset("graft.local.spillRows")

    // SPJ BUILD GATE: manifest bytes always gate the auto-route — with a
    // 1-byte budget the statement must keep the ordinary (shuffled) join
    val joinStmt = s"""SELECT c.c_mktsegment, count(*) AS cnt
      FROM '$root/t' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
    spark.conf.set("graft.route.buildBudgetBytes", "1")
    val gated = try Lake.sqlFrame(spark, joinStmt)
      finally spark.conf.unset("graft.route.buildBudgetBytes")
    assert(gated.queryExecution.executedPlan.toString.contains("Join"),
      "under-budget SPJ auto-route must refuse to the shuffled join")
    val routed = Lake.sqlFrame(spark, joinStmt)
    assert(!routed.queryExecution.executedPlan.toString.contains("Join"))
    assert(gated.collect().toSeq === routed.collect().toSeq)

    // AGG GATE: stats-driven — WITHOUT stats a tiny budget still routes
    // (the spill bounds memory); WITH current-version ANALYZE stats the
    // same budget refuses (plan keeps HashAggregate), results unchanged
    val aggStmt = s"""SELECT o_custkey, count(*) AS cnt FROM '$root/t'
      GROUP BY o_custkey ORDER BY o_custkey LIMIT 10"""
    spark.conf.set("graft.route.aggBudgetBytes", "1")
    try {
      val noStats = Lake.sqlFrame(spark, aggStmt)
      assert(!noStats.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "stats-less route must pass the gate (spill protects it)")
      Lake.sql(spark, s"ANALYZE TABLE '$root/t'")
      val refused = Lake.sqlFrame(spark, aggStmt)
      assert(refused.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "stats say the group map cannot fit — the route must refuse")
      assert(refused.collect().toSeq === noStats.collect().toSeq)
    } finally spark.conf.unset("graft.route.aggBudgetBytes")
    // with the default budget the analyzed table routes again
    val again = Lake.sqlFrame(spark, aggStmt)
    assert(!again.queryExecution.executedPlan.toString.contains("HashAggregate"))

    // STATS-FREE DISTINCT GATE (r19): without ANALYZE a distinct route is
    // bounded coarsely by manifest bytes (seen-sets have no spill path) —
    // a budget below the largest bucket ×4 refuses; FRESH stats re-admit
    // the same budget through the precise NDV seen-set model (tiny-NDV
    // distinct argument on the same buckets)
    val dRoot = java.nio.file.Files.createTempDirectory("graft_dgate").toString
    IcebergWrite.append(spark, orders, s"$dRoot/t",
      partitionBy = Seq("bucket(8, o_custkey)"))
    val maxBucket = Lake.bucketLayoutMoR(spark, s"$dRoot/t", "o_custkey")
      .get._2.values.map(_.map(_._2).sum).max
    val dStmt = s"""SELECT o_custkey, count(DISTINCT o_orderpriority) AS u
      FROM '$dRoot/t' GROUP BY o_custkey ORDER BY o_custkey LIMIT 5"""
    spark.conf.set("graft.route.aggBudgetBytes",
      (maxBucket * 4 - 1).toString)
    try {
      val gatedD = Lake.sqlFrame(spark, dStmt)
      assert(gatedD.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "stats-free distinct under the manifest bound must refuse")
      Lake.sql(spark, s"ANALYZE TABLE '$dRoot/t'")
      val admitted = Lake.sqlFrame(spark, dStmt)
      assert(!admitted.queryExecution.executedPlan.toString.contains("HashAggregate"),
        "fresh stats + tiny NDV must re-admit the distinct route")
      assert(admitted.collect().toSeq === gatedD.collect().toSeq)
    } finally spark.conf.unset("graft.route.aggBudgetBytes")
  }

  test("DELTA bucket layouts: same zero-exchange family, cross-format with Iceberg") {
    import graft.operators.{BucketedAgg, BucketedJoin}
    import graft.sources.{DeltaRead, DeltaWrite, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_dbk").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    // two appends per table: the second auto-adopts the stamped layout
    DeltaWrite.append(spark, orders.where(col("o_orderkey") % 2 === 0),
      s"$root/orders", partitionBy = Seq("bucket(8, o_custkey)"))
    DeltaWrite.append(spark, orders.where(col("o_orderkey") % 2 === 1),
      s"$root/orders")
    DeltaWrite.append(spark, customer, s"$root/customer",
      partitionBy = Seq("bucket(8, c_custkey)"))

    // the stamped layout reads back; Delta-Delta SPJ is shuffle-free and
    // exactly equal to the shuffled twin
    assert(DeltaRead.bucketLayoutSized(spark, s"$root/orders", "o_custkey")
      .exists(_._1 == 8))
    assert(BucketedJoin.coBucketed(spark, s"$root/orders", s"$root/customer",
      "o_custkey", "c_custkey"))
    val joined = BucketedJoin.coBucketedJoin(spark, s"$root/orders",
      s"$root/customer", "o_custkey", rightKey = "c_custkey")
    assert(!joined.rdd.toDebugString.contains("ShuffledRDD"))
    val twin = DeltaRead.snapshot(spark, s"$root/orders")
      .join(DeltaRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .drop("c_custkey").select(joined.columns.map(col): _*)
    assert(joined.count() === twin.count() && joined.count() > 0)
    assert(joined.exceptAll(twin).isEmpty && twin.exceptAll(joined).isEmpty)

    // CROSS-FORMAT: an Iceberg fact co-buckets with a Delta dimension —
    // both hash through the same engine-pinned Murmur3
    IcebergWrite.append(spark, orders, s"$root/orders_ice",
      partitionBy = Seq("bucket(8, o_custkey)"))
    assert(BucketedJoin.coBucketed(spark, s"$root/orders_ice",
      s"$root/customer", "o_custkey", "c_custkey"))
    val xfmt = BucketedJoin.coBucketedJoin(spark, s"$root/orders_ice",
      s"$root/customer", "o_custkey", rightKey = "c_custkey")
    assert(!xfmt.rdd.toDebugString.contains("ShuffledRDD"))
    val xTwin = Lake.read(spark, s"$root/orders_ice")
      .join(DeltaRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .drop("c_custkey").select(xfmt.columns.map(col): _*)
    assert(xfmt.count() === xTwin.count())
    assert(xfmt.exceptAll(xTwin).isEmpty && xTwin.exceptAll(xfmt).isEmpty)

    // plain SQL auto-routes over Delta tables: SPJ and the bucket-key
    // GROUP BY both plan exchange-free
    val stmt = s"""SELECT c.c_mktsegment, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS revenue
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      WHERE o.o_totalprice > 1000.0
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
    val routed = Lake.sqlFrame(spark, stmt)
    assert(!routed.queryExecution.executedPlan.toString.contains("Join"))
    val sTwin = DeltaRead.snapshot(spark, s"$root/orders")
      .where(col("o_totalprice") > 1000.0)
      .join(DeltaRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
    assert(routed.collect().toSeq === sTwin.collect().toSeq)
    val agg = Lake.sqlFrame(spark,
      s"""SELECT o_custkey, count(*) AS cnt FROM '$root/orders'
          GROUP BY o_custkey ORDER BY o_custkey LIMIT 10""")
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("ExistingRDD") && !aggPlan.contains("HashAggregate"),
      aggPlan.take(1500))
    assert(agg.count() === 10)
    assert(BucketedAgg.canAggLocally(spark, s"$root/orders", "o_custkey",
      Seq("o_custkey")))

    // DDL + INSERT keep the layout (INSERT auto-adopts via the property)
    Lake.sql(spark, s"""CREATE TABLE '$root/ddl' (id BIGINT, v DOUBLE)
        USING delta PARTITIONED BY (bucket(4, id))""")
    Lake.sql(spark, s"INSERT INTO '$root/ddl' SELECT id, id * 1.0 AS v FROM range(100)")
    assert(DeltaRead.bucketLayoutSized(spark, s"$root/ddl", "id").exists(_._1 == 4))

    // OPTIMIZE preserves the layout: per-bucket compaction re-stages the
    // merged files under fresh __gb= prefixes (two appends → ≥2 small
    // files per bucket → every bucket compacts), routes keep firing
    val preCompactFiles = DeltaRead.bucketLayoutSized(spark, s"$root/orders",
      "o_custkey").get._2.values.map(_.length).sum
    DeltaWrite.compact(spark, s"$root/orders")
    val postLayout = DeltaRead.bucketLayoutSized(spark, s"$root/orders", "o_custkey")
    assert(postLayout.exists(_._1 == 8), "compaction must keep the bucket layout")
    assert(postLayout.get._2.values.map(_.length).sum < preCompactFiles,
      "compaction must actually merge files")
    val postCompact = Lake.sqlFrame(spark, stmt)
    assert(!postCompact.queryExecution.executedPlan.toString.contains("Join"))
    assert(postCompact.collect().toSeq === sTwin.collect().toSeq)

    // a merge-on-read DELETE lands as DVs (paths — and so ordinals —
    // unchanged): since r19 the layout KEEPS being offered, the masks
    // apply inside the bucket-local scans, and the route still fires; the
    // mask-less compat probe is what refuses
    DeltaWrite.deleteWhere(spark, s"$root/customer", col("c_custkey") === 1L)
    assert(DeltaRead.bucketLayoutSized(spark, s"$root/customer", "c_custkey").isEmpty)
    assert(DeltaRead.bucketLayoutMoR(spark, s"$root/customer", "c_custkey").isDefined)
    assert(BucketedJoin.coBucketed(spark, s"$root/orders", s"$root/customer",
      "o_custkey", "c_custkey"))
    val fb = Lake.sqlFrame(spark, stmt)
    assert(!fb.queryExecution.executedPlan.toString.contains("Join"))
    val fbTwin = DeltaRead.snapshot(spark, s"$root/orders")
      .where(col("o_totalprice") > 1000.0)
      .join(DeltaRead.snapshot(spark, s"$root/customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("revenue"))
      .orderBy(col("c_mktsegment"))
    assert(fb.collect().toSeq === fbTwin.collect().toSeq)

    // a mismatched explicit spec on an existing bucketed table refuses
    intercept[IllegalArgumentException](DeltaWrite.append(spark, orders,
      s"$root/orders", partitionBy = Seq("bucket(4, o_custkey)")))

    // NULL bucket keys land in ordinal 0 — the layout survives (pre-fix a
    // single null row staged an undecodable dir and silently bricked it);
    // agg/DISTINCT keep the null group exact, joins drop nulls anyway
    val withNull = orders.limit(20).withColumn("o_custkey",
      when(col("o_orderkey") % 2 === 0, col("o_custkey")))
    DeltaWrite.append(spark, withNull, s"$root/nulls",
      partitionBy = Seq("bucket(8, o_custkey)"))
    assert(DeltaRead.bucketLayoutSized(spark, s"$root/nulls", "o_custkey").isDefined)
    val nd = BucketedAgg.bucketLocalDistinct(spark, s"$root/nulls",
      "o_custkey", Seq("o_custkey"))
    val ndTwin = DeltaRead.snapshot(spark, s"$root/nulls")
      .select(col("o_custkey")).distinct()
    assert(!nd.rdd.toDebugString.contains("ShuffledRDD"))
    assert(nd.count() === ndTwin.count()) // the null group included, once

    // mixed bucket + identity partitioning refuses loudly (pre-fix it
    // crashed downstream on a "column" named bucket(8, k))
    intercept[IllegalArgumentException](DeltaWrite.append(spark, orders,
      s"$root/mixed", partitionBy = Seq("bucket(8, o_custkey)", "o_orderkey")))
  }

  test("a RENAMED column refuses the bucket layout (name-read would null it)") {
    // our writer stamps parquet field ids; after a metadata-only RENAME the
    // files' physical names are the OLD ones. The main snapshot reader
    // resolves by id, but the per-bucket reader reads BY NAME — offering
    // the layout would silently read the renamed column (here the payload;
    // a join key is the same hazard) as NULL. bucketLayout must probe one
    // footer and refuse, so callers fall back to the (correct) shuffled plan.
    import graft.operators.BucketedJoin
    import graft.sources.IcebergWrite
    val root = java.nio.file.Files.createTempDirectory("graft_spj_ren").toString
    val a = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val b = Tables(spark, sf001, "customer")
      .select(col("c_custkey").as("o_custkey"), col("c_acctbal"))
    IcebergWrite.append(spark, a, s"$root/a", partitionBy = Seq("bucket(4, o_custkey)"))
    IcebergWrite.append(spark, b, s"$root/b", partitionBy = Seq("bucket(4, o_custkey)"))
    assert(BucketedJoin.coBucketed(spark, s"$root/a", s"$root/b", "o_custkey"))
    IcebergWrite.renameColumn(spark, s"$root/b", "c_acctbal", "balance")
    // the id-aware snapshot reader still sees real values under the new name
    val vals = graft.sources.IcebergRead.snapshot(spark, s"$root/b")
      .where(col("balance").isNotNull)
    assert(vals.count() > 0)
    // ...but the name-based bucket layout must refuse on BOTH probes
    assert(!BucketedJoin.coBucketed(spark, s"$root/a", s"$root/b", "o_custkey"))
    intercept[IllegalArgumentException](BucketedJoin.coBucketedJoin(spark,
      s"$root/a", s"$root/b", "o_custkey"))
    // MIXED lineage: new files written AFTER the rename carry the new
    // name, so a one-footer probe could land on a good file — the layout
    // must STILL refuse (pre-rename files would name-read the column as
    // NULL); the schema-chain drift check guarantees it regardless of
    // which footer the probe samples
    IcebergWrite.append(spark,
      b.withColumnRenamed("c_acctbal", "balance").limit(50),
      s"$root/b", partitionBy = Seq("bucket(4, o_custkey)"))
    assert(!BucketedJoin.coBucketed(spark, s"$root/a", s"$root/b", "o_custkey"))
  }

  test("merge-on-read deletes keep the bucket layout: DV and position-delete masks apply bucket-locally") {
    import graft.operators.{BucketedAgg, BucketedJoin}
    import graft.sources.{DeltaRead, DeltaWrite, IcebergRead, IcebergWrite, Lake, LayoutDeletes, NoDeletes}
    val root = java.nio.file.Files.createTempDirectory("graft_mor").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_acctbal"))

    // ---- DELTA: a DV delete must NOT forfeit the layout ----
    DeltaWrite.append(spark, orders, s"$root/d_orders",
      partitionBy = Seq("bucket(8, o_custkey)"))
    DeltaWrite.append(spark, customer, s"$root/d_customer",
      partitionBy = Seq("bucket(8, c_custkey)"))
    DeltaWrite.deleteWhere(spark, s"$root/d_orders", col("o_orderkey") % 7 === 0)
    // the delete landed as DVs (paths unchanged), and the MoR probe offers
    // the layout carrying them; the mask-less compat probe refuses
    val morD = Lake.bucketLayoutMoR(spark, s"$root/d_orders", "o_custkey")
    assert(morD.isDefined)
    assert(morD.get._3.isInstanceOf[LayoutDeletes.Dv],
      s"expected DV masks, got ${morD.get._3}")
    assert(Lake.bucketLayoutSized(spark, s"$root/d_orders", "o_custkey").isEmpty)

    // SPJ over the DV-masked fact: zero shuffle, equal to the shuffled
    // twin (whose snapshot reader applies the DVs independently)
    val joined = BucketedJoin.coBucketedJoin(spark,
      s"$root/d_orders", s"$root/d_customer", "o_custkey",
      rightKey = "c_custkey")
    assert(!joined.rdd.toDebugString.contains("ShuffledRDD"),
      joined.rdd.toDebugString.take(2000))
    val twin = DeltaRead.snapshot(spark, s"$root/d_orders")
      .join(DeltaRead.snapshot(spark, s"$root/d_customer"),
        col("o_custkey") === col("c_custkey"))
      .select(joined.columns.map(col): _*)
    assert(joined.count() === twin.count())
    assert(joined.exceptAll(twin).isEmpty && twin.exceptAll(joined).isEmpty)
    // no deleted row survives into the join
    assert(joined.where(col("o_orderkey") % 7 === 0).count() === 0)

    // bucket-local aggregation over the DV-masked table: counts must see
    // the deletes (the mask applies inside the per-bucket scans)
    val agg = BucketedAgg.bucketLocalAgg(spark, s"$root/d_orders",
      "o_custkey", Seq("o_custkey"),
      Seq(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("rev")))
    assert(!agg.rdd.toDebugString.contains("ShuffledRDD"))
    val aggTwin = DeltaRead.snapshot(spark, s"$root/d_orders")
      .groupBy("o_custkey")
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("rev"))
    assert(agg.count() === aggTwin.count())
    assert(agg.exceptAll(aggTwin).isEmpty && aggTwin.exceptAll(agg).isEmpty)

    // the plain-SQL auto-route still fires post-DELETE (statement surface)
    val routed = Lake.sqlFrame(spark,
      s"""SELECT o_custkey, count(*) AS cnt FROM '$root/d_orders'
          GROUP BY o_custkey ORDER BY o_custkey""")
    val routedTwin = DeltaRead.snapshot(spark, s"$root/d_orders")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy("o_custkey")
    assert(routed.collect().toSeq === routedTwin.collect().toSeq)

    // ---- ICEBERG: a position delete must NOT forfeit the layout ----
    IcebergWrite.append(spark, orders, s"$root/i_orders",
      partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, customer, s"$root/i_customer",
      partitionBy = Seq("bucket(8, c_custkey)"))
    IcebergWrite.deleteWhere(spark, s"$root/i_orders", col("o_orderkey") % 5 === 0)
    val morI = Lake.bucketLayoutMoR(spark, s"$root/i_orders", "o_custkey")
    assert(morI.isDefined)
    assert(morI.get._3.isInstanceOf[LayoutDeletes.Pos],
      s"expected position-delete masks, got ${morI.get._3}")
    assert(Lake.bucketLayoutSized(spark, s"$root/i_orders", "o_custkey").isEmpty)

    val ij = BucketedJoin.coBucketedJoin(spark,
      s"$root/i_orders", s"$root/i_customer", "o_custkey",
      rightKey = "c_custkey",
      leftWhere = Some(col("o_totalprice") > 1000.0))
    assert(!ij.rdd.toDebugString.contains("ShuffledRDD"),
      ij.rdd.toDebugString.take(2000))
    val ijTwin = IcebergRead.snapshot(spark, s"$root/i_orders")
      .where(col("o_totalprice") > 1000.0)
      .join(IcebergRead.snapshot(spark, s"$root/i_customer"),
        col("o_custkey") === col("c_custkey"))
      .select(ij.columns.map(col): _*)
    assert(ij.count() === ijTwin.count())
    assert(ij.exceptAll(ijTwin).isEmpty && ijTwin.exceptAll(ij).isEmpty)
    assert(ij.where(col("o_orderkey") % 5 === 0).count() === 0)

    // count(DISTINCT …) through the masked scans stays exact
    val cd = BucketedAgg.bucketLocalAgg(spark, s"$root/i_orders",
      "o_custkey", Seq("o_custkey"),
      Seq(countDistinct(col("o_orderkey")).as("uniq")))
    assert(!cd.rdd.toDebugString.contains("ShuffledRDD"))
    val cdTwin = IcebergRead.snapshot(spark, s"$root/i_orders")
      .groupBy("o_custkey").agg(countDistinct(col("o_orderkey")).as("uniq"))
    assert(cd.exceptAll(cdTwin).isEmpty && cdTwin.exceptAll(cd).isEmpty)

    // ---- EQUALITY deletes still refuse (sequence-number scoping) ----
    import spark.implicits._
    IcebergWrite.append(spark, customer, s"$root/i_eq",
      partitionBy = Seq("bucket(4, c_custkey)"))
    val keys = IcebergRead.snapshot(spark, s"$root/i_eq")
      .select("c_custkey").limit(3)
    IcebergWrite.deleteWhereEquals(spark, s"$root/i_eq", keys)
    assert(Lake.bucketLayoutMoR(spark, s"$root/i_eq", "c_custkey").isEmpty)
  }

  test("delete-budget gate: past graft.route.deleteBudgetBytes the MoR route refuses to the shuffled reader") {
    import graft.sources.{DeltaRead, DeltaWrite, IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_delbudget").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    DeltaWrite.append(spark, orders, s"$root/d",
      partitionBy = Seq("bucket(4, o_custkey)"))
    DeltaWrite.deleteWhere(spark, s"$root/d", col("o_orderkey") % 7 === 0)
    IcebergWrite.append(spark, orders, s"$root/i",
      partitionBy = Seq("bucket(4, o_custkey)"))
    IcebergWrite.deleteWhere(spark, s"$root/i", col("o_orderkey") % 5 === 0)

    // default budget (256 MiB): these tiny delete sets route
    assert(Lake.bucketLayoutMoR(spark, s"$root/d", "o_custkey").isDefined)
    assert(Lake.bucketLayoutMoR(spark, s"$root/i", "o_custkey").isDefined)

    val stmt = (t: String) =>
      s"""SELECT o_custkey, count(*) AS cnt FROM '$root/$t'
          GROUP BY o_custkey ORDER BY o_custkey"""
    val expectD = DeltaRead.snapshot(spark, s"$root/d")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy("o_custkey").collect().toSeq
    val expectI = IcebergRead.snapshot(spark, s"$root/i")
      .groupBy("o_custkey").agg(count(lit(1)).as("cnt"))
      .orderBy("o_custkey").collect().toSeq

    spark.conf.set("graft.route.deleteBudgetBytes", "1")
    try {
      // 1-byte budget: both formats' manifest-known delete volume exceeds
      // it — the route must refuse (no driver-side expansion), and the
      // statement surface must fall back to the shuffled MoR plan with
      // identical results
      assert(Lake.bucketLayoutMoR(spark, s"$root/d", "o_custkey").isEmpty)
      assert(Lake.bucketLayoutMoR(spark, s"$root/i", "o_custkey").isEmpty)
      assert(Lake.sqlFrame(spark, stmt("d")).collect().toSeq === expectD)
      assert(Lake.sqlFrame(spark, stmt("i")).collect().toSeq === expectI)
    } finally spark.conf.unset("graft.route.deleteBudgetBytes")

    // gate off (≤0): unbounded, the old behavior, route offered
    spark.conf.set("graft.route.deleteBudgetBytes", "0")
    try assert(Lake.bucketLayoutMoR(spark, s"$root/d", "o_custkey").isDefined)
    finally spark.conf.unset("graft.route.deleteBudgetBytes")
    // a delete-free table never consults the budget
    IcebergWrite.append(spark, orders, s"$root/clean",
      partitionBy = Seq("bucket(4, o_custkey)"))
    spark.conf.set("graft.route.deleteBudgetBytes", "1")
    try assert(Lake.bucketLayoutMoR(spark, s"$root/clean", "o_custkey").isDefined)
    finally spark.conf.unset("graft.route.deleteBudgetBytes")
  }

  test("file-stats pruning shrinks bucket scans under a range WHERE (both formats)") {
    import graft.operators.BucketedJoin
    import graft.sources.{DeltaRead, DeltaWrite, IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_bprune").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val mid = orders.agg(max(col("o_orderkey"))).head.get(0)
      .asInstanceOf[Number].longValue / 2

    // two appends with DISJOINT key ranges: every bucket holds files from
    // both, so a range WHERE must reject the out-of-range half per bucket
    Seq(
      ("ice", (df: org.apache.spark.sql.DataFrame, p: String) =>
        IcebergWrite.append(spark, df, p, partitionBy = Seq("bucket(4, o_custkey)"))),
      ("delta", (df: org.apache.spark.sql.DataFrame, p: String) =>
        DeltaWrite.append(spark, df, p, partitionBy = Seq("bucket(4, o_custkey)")): Unit)
    ).foreach { case (tag, append) =>
      val p = s"$root/$tag"
      append(orders.where(col("o_orderkey") <= mid), p)
      append(orders.where(col("o_orderkey") > mid), p)
      val layout = Lake.bucketLayoutMoR(spark, p, "o_custkey").get._2
      val total = layout.values.map(_.size).sum
      assert(total >= 2, s"$tag: expected multiple files, got $total")
      val pruned = BucketedJoin.pruneLayout(spark, p,
        Some(col("o_orderkey") <= mid), layout)
      val kept = pruned.values.map(_.size).sum
      assert(kept < total, s"$tag: range WHERE pruned nothing ($kept of $total)")
      assert(kept >= 1, s"$tag: range WHERE over-pruned")
      // an impossible predicate rejects EVERY file from the stats alone
      val none = BucketedJoin.pruneLayout(spark, p,
        Some(col("o_totalprice") > 1e18), layout)
      assert(none.values.forall(_.isEmpty), s"$tag: impossible WHERE kept files")
    }

    // the real join path: pruned scans, results hash-equal to the twin
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
    IcebergWrite.append(spark, customer, s"$root/cust",
      partitionBy = Seq("bucket(4, c_custkey)"))
    val joined = BucketedJoin.coBucketedJoin(spark,
      s"$root/ice", s"$root/cust", "o_custkey", rightKey = "c_custkey",
      leftWhere = Some(col("o_orderkey") <= mid))
    assert(!joined.rdd.toDebugString.contains("ShuffledRDD"))
    val twin = IcebergRead.snapshot(spark, s"$root/ice")
      .where(col("o_orderkey") <= mid)
      .join(IcebergRead.snapshot(spark, s"$root/cust"),
        col("o_custkey") === col("c_custkey"))
      .select(joined.columns.map(col): _*)
    assert(joined.count() === twin.count())
    assert(joined.exceptAll(twin).isEmpty && twin.exceptAll(joined).isEmpty)

    // both sides fully pruned: the routed plan opens NO parquet file at
    // all — the lineage carries no FileScanRDD, only the empty alignment
    // partitions
    val empty = BucketedJoin.coBucketedJoin(spark,
      s"$root/ice", s"$root/cust", "o_custkey", rightKey = "c_custkey",
      leftWhere = Some(col("o_totalprice") > 1e18),
      rightWhere = Some(col("c_acctbal") > 1e18))
    assert(empty.count() === 0)
    assert(!empty.rdd.toDebugString.contains("FileScanRDD"),
      empty.rdd.toDebugString.take(2000))
  }

  test("grace sub-partitioning: an over-budget build splits bucket-locally and stays exact") {
    import graft.operators.BucketedJoin
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_grace").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
    IcebergWrite.append(spark, orders, s"$root/orders",
      partitionBy = Seq("bucket(4, o_custkey)"))
    IcebergWrite.append(spark, customer, s"$root/customer",
      partitionBy = Seq("bucket(4, c_custkey)"))

    // budget ≈ a third of the largest right bucket → k ≈ 3 sub-joins per
    // bucket; the join stays shuffle-free and matches the un-graced twin
    // row for row. Round 20: grace is SINGLE-PASS — each graced bucket is
    // ONE partition whose task reads each side once and splits rows into
    // k spill runs locally (the old shape planned k chunks re-scanning
    // both sides k times), so the partition count stays n.
    val layout = Lake.bucketLayoutMoR(spark, s"$root/customer", "c_custkey").get._2
    val maxBytes = layout.values.map(_.map(_._2).sum).max
    val budget = math.max(1L, maxBytes / 3)
    val graced = BucketedJoin.coBucketedJoin(spark, s"$root/orders",
      s"$root/customer", "o_custkey", rightKey = "c_custkey",
      buildBudgetBytes = budget)
    assert(!graced.rdd.toDebugString.contains("ShuffledRDD"),
      graced.rdd.toDebugString.take(2000))
    assert(graced.rdd.getNumPartitions === 4,
      s"single-pass grace keeps one partition per bucket, got ${graced.rdd.getNumPartitions}")
    val twin = BucketedJoin.coBucketedJoin(spark, s"$root/orders",
      s"$root/customer", "o_custkey", rightKey = "c_custkey")
    assert(graced.count() === twin.count() && graced.count() > 0)
    assert(graced.exceptAll(twin).isEmpty && twin.exceptAll(graced).isEmpty)

    // absurdly small budget: more than MaxGraceSplits slices → loud refusal
    intercept[IllegalArgumentException](BucketedJoin.coBucketedJoin(spark,
      s"$root/orders", s"$root/customer", "o_custkey", rightKey = "c_custkey",
      buildBudgetBytes = 1L))

    // the auto-route with an over-budget build now routes VIA grace
    // instead of refusing — including the FUSED join+rollup (grace slices
    // are key-confined, so per-partition groups stay complete)
    val stmt = s"""SELECT c.c_mktsegment, count(*) AS cnt
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
    val fusedStmt = s"""SELECT o.o_custkey, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS rev
      FROM '$root/orders' o JOIN '$root/customer' c ON o.o_custkey = c.c_custkey
      GROUP BY o.o_custkey ORDER BY o.o_custkey"""
    val shuffledTwin = Lake.sqlFrame(spark, stmt).collect().toSeq
    val fusedTwin = Lake.sqlFrame(spark, fusedStmt).collect().toSeq
    spark.conf.set("graft.route.buildBudgetBytes", (budget * 4).toString)
    try {
      val routed = Lake.sqlFrame(spark, stmt)
      assert(!routed.queryExecution.executedPlan.toString.contains("Join"),
        "over-budget SPJ must grace-split, not refuse")
      assert(routed.collect().toSeq === shuffledTwin)
      val fused = Lake.sqlFrame(spark, fusedStmt)
      val fusedPlan = fused.queryExecution.executedPlan.toString
      assert(!fusedPlan.contains("Join") && !fusedPlan.contains("HashAggregate"),
        fusedPlan.take(2000))
      assert(fused.collect().toSeq === fusedTwin)
    } finally spark.conf.unset("graft.route.buildBudgetBytes")
  }

  test("single-pass grace keeps join-type and residual semantics through the spill runs") {
    import graft.operators.BucketedJoin
    import graft.sources.{IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_grace_jt").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    // halve the customers so anti/outer legs are non-trivial
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_acctbal"))
      .where(col("c_custkey") % 2 === 0)
    IcebergWrite.append(spark, orders, s"$root/orders",
      partitionBy = Seq("bucket(4, o_custkey)"))
    IcebergWrite.append(spark, customer, s"$root/customer",
      partitionBy = Seq("bucket(4, c_custkey)"))
    val maxBytes = Lake.bucketLayoutMoR(spark, s"$root/customer", "c_custkey")
      .get._2.values.map(_.map(_._2).sum).max
    val budget = math.max(1L, maxBytes / 3)
    def join(jt: String, budgetBytes: Long, res: Option[org.apache.spark.sql.Column]) =
      BucketedJoin.coBucketedJoin(spark, s"$root/orders", s"$root/customer",
        "o_custkey", joinType = jt, rightKey = "c_custkey",
        residual = res, buildBudgetBytes = budgetBytes)
    for (jt <- Seq("inner", "left", "left_semi", "left_anti")) {
      val graced = join(jt, budget, None)
      val plain = join(jt, 0L, None)
      assert(!graced.rdd.toDebugString.contains("ShuffledRDD"))
      assert(graced.count() === plain.count(), s"joinType=$jt")
      assert(graced.exceptAll(plain).isEmpty && plain.exceptAll(graced).isEmpty,
        s"joinType=$jt differs between graced and plain")
    }
    // residual ON conjunct evaluated inside each sub-join
    val res = Some(col("o_totalprice") > col("c_acctbal"))
    val gr = join("left", budget, res)
    val pl = join("left", 0L, res)
    assert(gr.exceptAll(pl).isEmpty && pl.exceptAll(gr).isEmpty)
  }

  test("bucket-local windows: PARTITION BY the bucket key plans without a window exchange") {
    import graft.sources.{DeltaWrite, IcebergRead, IcebergWrite, Lake}
    import org.apache.spark.sql.expressions.Window
    val root = java.nio.file.Files.createTempDirectory("graft_bwin").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 0),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))
    IcebergWrite.append(spark, orders.where(col("o_orderkey") % 2 === 1),
      s"$root/t", partitionBy = Seq("bucket(8, o_custkey)"))

    val stmt = s"""SELECT o_orderkey, o_custkey,
        row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn,
        round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS run
      FROM '$root/t' WHERE o_totalprice > 1000.0
      ORDER BY o_custkey, o_orderkey"""
    val routed = Lake.sqlFrame(spark, stmt)
    // the routed result is a PARTITIONING-ERASED BARRIER over the
    // window-bearing lineage (the nominal HashPartitioning must never
    // escape into user composition): the returned frame's Spark plan is
    // the barrier scan — no Window node, no window exchange — where the
    // FALLBACK plan carries both (see `off` below)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") && !plan.contains("Window"),
      plan.take(2000))
    assert(!plan.contains("Exchange hashpartitioning"), plan.take(2500))
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderkey"))
    val twin = IcebergRead.snapshot(spark, s"$root/t")
      .where(col("o_totalprice") > 1000.0)
      .select(col("o_orderkey"), col("o_custkey"),
        row_number().over(w).as("rn"),
        round(sum(col("o_totalprice")).over(w), 2).as("run"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
    assert(routed.collect().toSeq === twin.collect().toSeq)

    // without the statement tail the whole lineage is shuffle-free (the
    // barrier RDD IS the inner window lineage — one narrow stage)
    val noTail = Lake.sqlFrame(spark,
      s"""SELECT o_custkey,
          row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        FROM '$root/t'""")
    assert(!noTail.queryExecution.executedPlan.toString.contains("Window"))
    assert(!noTail.rdd.toDebugString.contains("ShuffledRDD"),
      noTail.rdd.toDebugString.take(2000))

    // the barrier makes the routed frame SAFE to compose: a later join
    // must NOT trust the nominal bucket hash as Spark placement — both
    // sides re-exchange and every row finds its match
    val dim = IcebergRead.snapshot(spark, s"$root/t")
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("k"))
    assert(noTail.join(dim, "o_custkey").count() === noTail.count())

    // PARTITION BY a non-bucket column refuses: the ordinary plan (with
    // its Window node and window exchange) runs, results correct
    val off = Lake.sqlFrame(spark,
      s"""SELECT o_orderkey,
          row_number() OVER (PARTITION BY o_orderkey ORDER BY o_totalprice) AS rn
        FROM '$root/t' ORDER BY o_orderkey LIMIT 10""")
    val offPlan = off.queryExecution.executedPlan.toString
    assert(offPlan.contains("Window") &&
      offPlan.contains("Exchange hashpartitioning"), offPlan.take(2000))
    assert(off.count() === 10)

    // Delta layouts route the same way — and this statement's ONLY OVER
    // sits NESTED inside round(...), proving the fast-path OVER guard is
    // depth-blind (a depth-0-only scan would let selectExpr swallow it
    // and the full-fact window exchange would come back)
    DeltaWrite.append(spark, orders, s"$root/dt",
      partitionBy = Seq("bucket(8, o_custkey)"))
    val dRouted = Lake.sqlFrame(spark,
      s"""SELECT o_custkey,
          round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey), 2) AS run
        FROM '$root/dt'""")
    assert(!dRouted.queryExecution.executedPlan.toString.contains("Window"))
    assert(!dRouted.rdd.toDebugString.contains("ShuffledRDD"))
    assert(dRouted.count() === orders.count())
  }

  test("composite day+bucket layouts: date pruning composes with the zero-exchange join") {
    import graft.operators.BucketedJoin
    import graft.sources.{IcebergRead, IcebergWrite, Lake}
    val root = java.nio.file.Files.createTempDirectory("graft_comp").toString
    val orders = Tables(spark, sf001, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderdate"))
    val customer = Tables(spark, sf001, "customer")
      .select(col("c_custkey"), col("c_mktsegment"))
    // the canonical 100 TB fact layout: date-partitioned AND bucketed
    IcebergWrite.append(spark, orders, s"$root/o",
      partitionBy = Seq("day(o_orderdate)", "bucket(4, o_custkey)"))
    IcebergWrite.append(spark, customer, s"$root/c",
      partitionBy = Seq("bucket(4, c_custkey)"))

    // the probe tolerates the sibling day() field: layout offered, many
    // files per bucket (one per live day)
    val layout = Lake.bucketLayoutMoR(spark, s"$root/o", "o_custkey")
    assert(layout.isDefined, "composite day+bucket spec must offer the layout")
    val total = layout.get._2.values.map(_.size).sum
    assert(total > 4, s"expected per-day files, got $total")

    // a date-range WHERE prunes whole days' files (the day() transform's
    // derived intervals feed the same stats translator)
    val Seq(mnD, mxD) = orders
      .agg(min(col("o_orderdate")), max(col("o_orderdate"))).head
      .toSeq.map(_.asInstanceOf[java.sql.Timestamp])
    val cut = new java.sql.Timestamp((mnD.getTime + mxD.getTime) / 2)
    val pruned = BucketedJoin.pruneLayout(spark, s"$root/o",
      Some(col("o_orderdate") >= lit(cut)), layout.get._2)
    val kept = pruned.values.map(_.size).sum
    assert(kept < total && kept >= 1, s"date WHERE kept $kept of $total")

    // the routed star query: pruned, masked, ZERO-exchange fact join —
    // results equal the shuffled twin
    val cutLit = cut.toString.take(19)
    val stmt = s"""SELECT c.c_mktsegment, count(*) AS cnt,
        round(sum(o.o_totalprice), 2) AS rev
      FROM '$root/o' o JOIN '$root/c' c ON o.o_custkey = c.c_custkey
      WHERE o.o_orderdate >= TIMESTAMP '$cutLit'
      GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""
    val routed = Lake.sqlFrame(spark, stmt)
    val plan = routed.queryExecution.executedPlan.toString
    assert(plan.contains("ExistingRDD") && !plan.contains("SortMergeJoin") &&
      !plan.contains("BroadcastHashJoin"), plan.take(2000))
    val twin = IcebergRead.snapshot(spark, s"$root/o")
      .where(col("o_orderdate") >= lit(cut))
      .join(IcebergRead.snapshot(spark, s"$root/c"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("rev"))
      .orderBy(col("c_mktsegment"))
    assert(routed.collect().toSeq === twin.collect().toSeq)

    // direct API: the join itself is shuffle-free with the date WHERE
    val j = BucketedJoin.coBucketedJoin(spark, s"$root/o", s"$root/c",
      "o_custkey", rightKey = "c_custkey",
      leftWhere = Some(col("o_orderdate") >= lit(cut)))
    assert(!j.rdd.toDebugString.contains("ShuffledRDD"))
    assert(j.count() === IcebergRead.snapshot(spark, s"$root/o")
      .where(col("o_orderdate") >= lit(cut))
      .join(IcebergRead.snapshot(spark, s"$root/c"),
        col("o_custkey") === col("c_custkey")).count())
  }
}
