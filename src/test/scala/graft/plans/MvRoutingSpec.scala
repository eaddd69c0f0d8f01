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
    withMv(keys, measures) { (base, _) =>
      val g = spark.read.parquet(base)
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("s"))
      assert(scannedLocations(g).contains("/mv"),
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
      assert(scannedLocations(e).contains("/mv"))
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
    withMv(keys, measures) { (base, _) =>
      // overwrite the base file with DIFFERENT content at the same path:
      // a path-only fingerprint would still match; len+mtime must not
      val other = new java.io.File(s"$sf001/orders.parquet")
      Files.copy(other.toPath, new java.io.File(base).toPath,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      val q = spark.read.parquet(base)
        .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("c"))
      assert(scannedLocations(q).contains("lineitem.parquet"),
        "stale MV must not serve the query")
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
      assert(scannedLocations(back).contains("/mv"))
    }
  }

  test("routed output keeps attribute ids — downstream operators resolve") {
    withMv(keys, measures) { (base, _) =>
      val a = spark.read.parquet(base)
        .groupBy(col("l_returnflag")).agg(round(sum(col("l_quantity")), 2).as("s"))
      val dim = spark.createDataFrame(Seq(("A", "accept"), ("R", "reject")))
        .toDF("l_returnflag", "label")
      val joined = a.join(dim, Seq("l_returnflag")).orderBy(col("l_returnflag"))
      assert(scannedLocations(joined).contains("/mv"))
      assert(joined.collect().length === 2)
    }
  }
}
