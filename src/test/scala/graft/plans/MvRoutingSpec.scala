package graft.plans

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Transparent MV routing: result parity with the base plan, physical
  * proof the routed plan reads the MV (scan location), and every bail
  * path (non-key filter, DISTINCT, underivable agg, stale base, kill
  * switch) falling through to the base untouched. */
class MvRoutingSpec extends SparkSpec {

  private def tmp(p: String): String =
    Files.createTempDirectory(p).toString

  /** Copy the sf0.001 lineitem file into its own directory so specs can
    * mutate the base (freshness cases) without touching testdata. */
  private def freshBase(): String = {
    val dir = tmp("mv_base")
    val src = new java.io.File(s"$sf001/lineitem.parquet")
    Files.copy(src.toPath, new java.io.File(s"$dir/lineitem.parquet").toPath)
    s"$dir/lineitem.parquet"
  }

  private def scannedLocations(df: DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  private def withMv[A](keys: Seq[String], measures: Seq[String])(
      body: (String, String) => A): A = {
    val base = freshBase()
    val mv = tmp("mv_idx") + "/mv"
    Mv.create(spark, base, mv, keys, measures)
    try body(base, mv)
    finally Mv.clearRegistry()
  }

  private val keys = Seq("l_returnflag", "l_linestatus", "l_shipdate")
  private val measures = Seq("l_quantity", "l_extendedprice")

  private def agg(base: String) =
    spark.read.parquet(base)
      .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("cnt"),
        count(col("l_extendedprice")).as("cnt_price"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(max(col("l_extendedprice")), 2).as("max_price"),
        round(min(col("l_quantity")), 2).as("min_qty"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  test("routed aggregate reads the MV and matches the base answer") {
    withMv(keys, measures) { (base, mv) =>
      val routed = agg(base)
      val plan = scannedLocations(routed)
      assert(plan.contains(mv), plan.take(2000))
      assert(!plan.contains("lineitem.parquet"), plan.take(2000))
      spark.conf.set("spark.graft.mv.routing", "false")
      val baseline = try agg(base).collect() finally
        spark.conf.set("spark.graft.mv.routing", "true")
      assert(routed.collect().toSeq.map(_.toSeq) === baseline.toSeq.map(_.toSeq))
    }
  }

  test("global aggregate (no grouping) routes; empty filter match keeps count=0") {
    withMv(keys, measures) { (base, mv) =>
      val g = spark.read.parquet(base)
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("s"))
      // assert on the exact mv path — the base's own /tmp/mv_base… dir name
      // contains the substring "/mv", which would make a bare contains("/mv")
      // pass even with routing broken
      assert(scannedLocations(g).contains(mv),
        "global aggregate should route")
      val r = g.collect()(0)
      spark.conf.set("spark.graft.mv.routing", "false")
      val b = try spark.read.parquet(base)
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("s"))
        .collect()(0)
      finally spark.conf.set("spark.graft.mv.routing", "true")
      assert(r.toSeq === b.toSeq)
      // empty match: count must be 0 (not NULL) exactly like the base plan
      val e = spark.read.parquet(base)
        .where(col("l_shipdate") < lit("1900-01-01").cast("timestamp"))
        .agg(count(lit(1)).as("cnt"), sum(col("l_quantity")).as("s"))
      assert(scannedLocations(e).contains(mv))
      val row = e.collect()(0)
      assert(row.getLong(0) === 0L && row.isNullAt(1))
    }
  }

  test("bail paths leave the base plan untouched") {
    withMv(keys, measures) { (base, _) =>
      // filter on a NON-key (measure) column
      val f = spark.read.parquet(base).where(col("l_quantity") > 10)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      assert(scannedLocations(f).contains("lineitem.parquet"))
      // DISTINCT aggregate
      val d = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(countDistinct(col("l_quantity")).as("s"))
      assert(scannedLocations(d).contains("lineitem.parquet"))
      // aggregate over a non-measure column
      val n = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(sum(col("l_tax")).as("s"))
      assert(scannedLocations(n).contains("lineitem.parquet"))
      // grouping by a non-key column
      val g = spark.read.parquet(base)
        .groupBy(col("l_suppkey")).agg(sum(col("l_quantity")).as("s"))
      assert(scannedLocations(g).contains("lineitem.parquet"))
      // kill switch
      spark.conf.set("spark.graft.mv.routing", "false")
      try assert(scannedLocations(spark.read.parquet(base)
          .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s")))
        .contains("lineitem.parquet"))
      finally spark.conf.set("spark.graft.mv.routing", "true")
    }
  }

  test("stale base (in-place overwrite, same path) disables routing") {
    withMv(keys, measures) { (base, mv) =>
      // overwrite the base file with DIFFERENT same-schema content at the
      // same path (the sf0.01 lineitem): a path-only fingerprint would
      // still match; len+mtime must not. Grouping stays on MV KEYS so the
      // rewrite reaches the freshness gate instead of bailing earlier —
      // a non-key grouping would pass this test with the gate deleted.
      val other = new java.io.File(s"$sf01/lineitem.parquet")
      Files.copy(other.toPath, new java.io.File(base).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val q = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("c"))
      val plan = scannedLocations(q)
      assert(plan.contains("lineitem.parquet") && !plan.contains(mv),
        "stale MV must not serve the query")
      // and the served answer is the NEW content's, not the MV's snapshot
      val fresh = spark.read.parquet(s"$sf01/lineitem.parquet")
        .groupBy(col("l_returnflag")).agg(count(lit(1)).as("c"))
        .collect().map(_.toSeq).toSet
      assert(q.collect().map(_.toSeq).toSet === fresh)
    }
  }

  test("refresh rebuilds from the recorded derivation and re-enables routing") {
    withMv(keys, measures) { (base, mv) =>
      // touch the base (append a copy alongside would change the path set;
      // an in-place rewrite with identical content changes mtime) → stale
      val f = new java.io.File(base)
      assert(f.setLastModified(f.lastModified() + 60000))
      val stale = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      assert(scannedLocations(stale).contains("lineitem.parquet"))
      Mv.refresh(spark, mv)
      val back = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
      assert(scannedLocations(back).contains(mv))
    }
  }

  // ---- incremental maintenance over a Delta base ----

  private val dKeys = Seq("l_returnflag", "l_linestatus")
  private val dMeasures = Seq("l_quantity", "l_extendedprice")

  private def deltaBase(): String = {
    val dir = tmp("mv_dbase") + "/tbl"
    graft.sources.DeltaWrite.append(spark,
      spark.read.parquet(s"$sf001/lineitem.parquet")
        .select(dKeys.map(col) ++ dMeasures.map(col): _*)
        .where(col("l_linestatus") === "F"), dir)
    dir
  }

  private def deltaAgg(table: String) =
    graft.sources.DeltaRead.snapshot(spark, table)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("s"), count(lit(1)).as("c"),
        round(min(col("l_quantity")), 2).as("mn"),
        round(max(col("l_extendedprice")), 2).as("mx"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  /** The stored MV rows, canonicalized for comparison (6-dp on the double
    * partials — carried-over vs recomputed sums may re-associate). */
  private def mvRows(d: Mv.MvDef): Seq[Seq[Any]] =
    spark.read.parquet(s"${d.mvPath}/${d.dataDir}")
      .select(col("l_returnflag"), col("l_linestatus"),
        round(col("sum_l_quantity"), 6), col("cnt_l_quantity"),
        round(col("min_l_quantity"), 6), round(col("max_l_extendedprice"), 6),
        col("cnt_star"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq.map(_.toSeq)

  private def expectedMvRows(table: String): Seq[Seq[Any]] =
    graft.sources.DeltaRead.snapshot(spark, table)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 6).as("sq"),
        count(col("l_quantity")).as("cq"),
        round(min(col("l_quantity")), 6).as("mnq"),
        round(max(col("l_extendedprice")), 6).as("mxp"),
        count(lit(1)).as("cs"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq.map(_.toSeq)

  test("delta base: routes at build version; append disables; incremental refresh re-enables") {
    val table = deltaBase()
    val mv = tmp("mv_didx") + "/mv"
    val d0 = Mv.createDelta(spark, table, mv, dKeys, dMeasures)
    try {
      assert(scannedLocations(deltaAgg(table)).contains(mv),
        "clean snapshot should route")
      graft.sources.DeltaWrite.append(spark,
        spark.read.parquet(s"$sf001/lineitem.parquet")
          .select(dKeys.map(col) ++ dMeasures.map(col): _*)
          .where(col("l_linestatus") === "O"), table)
      // the new snapshot's relation key differs → lookup miss, no stale rows
      val after = deltaAgg(table)
      // NOT-contains on the exact mv path: a bare "/mv" would false-match
      // the base's own /tmp/mv_dbase… directory name
      assert(!scannedLocations(after).contains(mv),
        "stale MV must not serve the appended snapshot")
      val expected = after.collect().toSeq.map(_.toSeq)
      val d1 = Mv.refreshIncremental(spark, mv)
      assert(d1.baseVersion > d0.baseVersion)
      val routed = deltaAgg(table)
      assert(scannedLocations(routed).contains(mv), "refreshed MV routes again")
      assert(routed.collect().toSeq.map(_.toSeq) === expected)
      // idempotent no-op when the base hasn't moved
      assert(Mv.refreshIncremental(spark, mv).baseVersion === d1.baseVersion)
    } finally Mv.clearRegistry()
  }

  test("incremental refresh carries unaffected groups over untouched (tamper survives)") {
    val table = deltaBase() // groups (*, F) only
    val mv = tmp("mv_didx2") + "/mv"
    val d0 = Mv.createDelta(spark, table, mv, dKeys, dMeasures)
    try {
      // tamper the stored partial of ONE group that the coming change feed
      // does not touch: if refresh recomputed it, the tamper would be
      // repaired — its survival is physical proof of the carry-over leg
      val store = s"$mv/${d0.dataDir}"
      val tampered = spark.read.parquet(store)
        .withColumn("sum_l_quantity",
          when(col("l_returnflag") === "R", lit(-999999.0))
            .otherwise(col("sum_l_quantity")))
        .localCheckpoint(true)
      tampered.write.mode("overwrite").parquet(store)
      graft.sources.DeltaWrite.append(spark,
        spark.read.parquet(s"$sf001/lineitem.parquet")
          .select(dKeys.map(col) ++ dMeasures.map(col): _*)
          .where(col("l_linestatus") === "O"), table) // affects (*, O) only
      val d1 = Mv.refreshIncremental(spark, mv)
      val rows = mvRows(d1)
      val exp = expectedMvRows(table)
      val rF = rows.find(r => r.head == "R" && r(1) == "F").get
      assert(rF(2) === -999999.0, s"unaffected (R,F) group was recomputed: $rF")
      // every OTHER row (the O groups, and untampered F groups) is correct
      assert(rows.filterNot(r => r.head == "R" && r(1) == "F") ===
        exp.filterNot(r => r.head == "R" && r(1) == "F"))
    } finally Mv.clearRegistry()
  }

  test("incremental refresh after a delete retracts min/max (full-group recompute)") {
    val table = deltaBase()
    val mv = tmp("mv_didx3") + "/mv"
    Mv.createDelta(spark, table, mv, dKeys, dMeasures)
    try {
      // delete the heavy tail of one group — pure +/- delta algebra could
      // fix sum/count but NOT retract the group's max; the group recompute
      // must
      val cut = graft.sources.DeltaRead.snapshot(spark, table)
        .where(col("l_returnflag") === "A")
        .agg(expr("percentile(l_extendedprice, 0.9)")).collect()(0).getDouble(0)
      graft.sources.DeltaWrite.deleteWhere(spark, table,
        col("l_returnflag") === "A" && col("l_extendedprice") >= cut)
      val d1 = Mv.refreshIncremental(spark, mv)
      assert(mvRows(d1) === expectedMvRows(table))
    } finally Mv.clearRegistry()
  }

  test("iceberg base: createIceberg + incremental refresh from the iceberg change feed") {
    val dir = tmp("mvicebase") + "/tbl"
    val li = spark.read.parquet(s"$sf001/lineitem.parquet")
      .select(dKeys.map(col) ++ dMeasures.map(col): _*)
    graft.sources.IcebergWrite.append(spark, li.where(col("l_linestatus") === "F"), dir)
    val mv = tmp("mvice_idx") + "/mv"
    val d0 = Mv.createIceberg(spark, dir, mv, dKeys, dMeasures)
    try {
      graft.sources.IcebergWrite.append(spark,
        li.where(col("l_linestatus") === "O"), dir)
      val d1 = Mv.refreshIncremental(spark, mv)
      assert(d1.baseVersion !== d0.baseVersion)
      // MV content equals a full recompute of the current snapshot
      assert(mvRowsIce(d1, dir))
      // no-op when the base hasn't moved
      assert(Mv.refreshIncremental(spark, mv).baseVersion === d1.baseVersion)
    } finally Mv.clearRegistry()
  }

  /** MV store rows == fresh rollup of the iceberg snapshot (6-dp canon). */
  private def mvRowsIce(d: Mv.MvDef, table: String): Boolean = {
    val got = mvRows(d)
    val exp = graft.sources.IcebergRead.snapshot(spark, table)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 6).as("sq"),
        count(col("l_quantity")).as("cq"),
        round(min(col("l_quantity")), 6).as("mnq"),
        round(max(col("l_extendedprice")), 6).as("mxp"),
        count(lit(1)).as("cs"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
      .collect().toSeq.map(_.toSeq)
    got === exp
  }

  test("SQL statement lifecycle: CREATE / REFRESH / DROP MATERIALIZED VIEW") {
    val table = deltaBase()
    val mv = tmp("mv_dsql") + "/mv"
    try {
      val v0 = graft.sources.Lake.sql(spark,
        s"CREATE MATERIALIZED VIEW '$mv' ON '$table' " +
          "KEYS (l_returnflag, l_linestatus) MEASURES (l_quantity, l_extendedprice)")
      assert(v0 === 0L)
      assert(scannedLocations(deltaAgg(table)).contains(mv))
      graft.sources.DeltaWrite.append(spark,
        spark.read.parquet(s"$sf001/lineitem.parquet")
          .select(dKeys.map(col) ++ dMeasures.map(col): _*)
          .where(col("l_linestatus") === "O"), table)
      val v1 = graft.sources.Lake.sql(spark, s"REFRESH MATERIALIZED VIEW '$mv'")
      assert(v1 === 1L)
      val routed = deltaAgg(table)
      assert(scannedLocations(routed).contains(mv))
      spark.conf.set("spark.graft.mv.routing", "false")
      val expected = try deltaAgg(table).collect() finally
        spark.conf.set("spark.graft.mv.routing", "true")
      assert(routed.collect().toSeq.map(_.toSeq) === expected.toSeq.map(_.toSeq))
      graft.sources.Lake.sql(spark, s"DROP MATERIALIZED VIEW '$mv'")
      assert(!scannedLocations(deltaAgg(table)).contains(mv), "dropped MV must not route")
      val p = new org.apache.hadoop.fs.Path(mv)
      assert(!p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p),
        "DROP deletes the store")
    } finally Mv.clearRegistry()
  }

  test("statement-text aggregate over a lake path routes to the MV") {
    withMv(keys, measures) { (base, mv) =>
      // the delegated SELECT resolves to the same relation the API read
      // plans, so MvRoutingRule fires on statement text too
      val stmt = s"SELECT l_returnflag, round(sum(l_quantity), 2) AS s, " +
        s"count(*) AS c FROM '$base' GROUP BY l_returnflag ORDER BY l_returnflag"
      val routed = graft.sources.Lake.sqlFrame(spark, stmt)
      val plan = scannedLocations(routed)
      assert(plan.contains(mv) && !plan.contains("lineitem.parquet"), plan.take(2000))
      spark.conf.set("spark.graft.mv.routing", "false")
      val baseline = try graft.sources.Lake.sqlFrame(spark, stmt)
        .collect().toSeq.map(_.toSeq)
      finally spark.conf.set("spark.graft.mv.routing", "true")
      assert(routed.collect().toSeq.map(_.toSeq) === baseline)
    }
  }

  test("statement-text aggregate over a DELTA base routes to its MV") {
    val table = deltaBase()
    val mv = tmp("mv_dsql_stmt") + "/mv"
    try {
      Mv.createDelta(spark, table, mv, Seq("l_returnflag"), Seq("l_quantity"))
      val stmt = s"SELECT l_returnflag, round(sum(l_quantity), 2) AS s " +
        s"FROM '$table' GROUP BY l_returnflag ORDER BY l_returnflag"
      val routed = graft.sources.Lake.sqlFrame(spark, stmt)
      assert(scannedLocations(routed).contains(mv),
        "a delegated statement over a Delta base must route to the MV")
      spark.conf.set("spark.graft.mv.routing", "false")
      val baseline = try graft.sources.Lake.sqlFrame(spark, stmt)
        .collect().toSeq.map(_.toSeq)
      finally spark.conf.set("spark.graft.mv.routing", "true")
      assert(routed.collect().toSeq.map(_.toSeq) === baseline)
    } finally Mv.clearRegistry()
  }

  test("DROP MATERIALIZED VIEW refuses a path that is not an MV store") {
    val victim = tmp("mv_victim")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(victim, "precious.txt"), "do not delete")
    val e = intercept[IllegalArgumentException](
      graft.sources.Lake.sql(spark, s"DROP MATERIALIZED VIEW '$victim'"))
    assert(e.getMessage.contains("_mv_meta.json"), e.getMessage)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(victim, "precious.txt")), "target must survive")
  }

  test("refreshIncremental refuses a parquet-format MV") {
    withMv(keys, measures) { (_, mv) =>
      val e = intercept[IllegalArgumentException](Mv.refreshIncremental(spark, mv))
      assert(e.getMessage.contains("versioned lake base"), e.getMessage)
    }
  }

  test("routed output keeps attribute ids — downstream operators resolve") {
    withMv(keys, measures) { (base, mv) =>
      val a = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(round(sum(col("l_quantity")), 2).as("s"))
      val dim = spark.createDataFrame(Seq(("A", "accept"), ("R", "reject")))
        .toDF("l_returnflag", "label")
      val joined = a.join(dim, Seq("l_returnflag")).orderBy(col("l_returnflag"))
      assert(scannedLocations(joined).contains(mv))
      assert(joined.collect().length === 2)
    }
  }
}
