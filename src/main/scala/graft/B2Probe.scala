package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic: alternative physical shapes for b2 (5-way join chain).
  * Run manually against the compacted bench dir; not part of the suite. */
object B2Probe {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/tmp/graft-bench-sf0.1")
    val spark = GraftSession.builder().getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    def t(n: String) = Tables(spark, dir, n)
    val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))

    // current shape: dim-reduced broadcast chain
    def current(s: SparkSession): DataFrame = queries.BenchQueries.b2.build(s, dir)

    // variant: shuffle-hash lineitem⋈orders, broadcast the dim side into orders first
    def shuffleHash(s: SparkSession): DataFrame = {
      val cust = t("region").filter(col("r_name") === "ASIA")
        .join(t("nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t("customer"), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"))
      val ord = t("orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("n_name"), col("o_orderkey"))
      t("lineitem").hint("shuffle_hash")
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    // variant: collapse the fixed-cardinality dims (region⋈nation = ≤25 rows
    // at ANY scale) into an isin literal — removes two BroadcastExchange jobs
    def dimCollapsed(s: SparkSession): DataFrame = {
      val asiaNations = t("region").filter(col("r_name") === "ASIA")
        .join(t("nation"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")).collect()
      val keys = asiaNations.map(r => r.get(0).asInstanceOf[Number].longValue)
      val cust = t("customer").filter(col("c_nationkey").isin(keys: _*))
        .select(col("c_custkey"), col("c_nationkey"))
      val ord = t("orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("o_orderkey"))
      val names = t("nation").select(col("n_nationkey"), col("n_name"))
      t("lineitem")
        .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_nationkey"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .join(broadcast(names), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    def t9(f: => Unit): Double = (1 to 9).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(2)

    // variant: every join shuffle_hash → ONE job, many stages (no broadcast
    // build jobs at all)
    def fullShuffle(s: SparkSession): DataFrame = {
      val cust = t("region").filter(col("r_name") === "ASIA").hint("shuffle_hash")
        .join(t("nation").hint("shuffle_hash"), col("n_regionkey") === col("r_regionkey"))
        .join(t("customer").hint("shuffle_hash"), col("c_nationkey") === col("n_nationkey"))
        .select(col("n_name"), col("c_custkey"))
      val ord = t("orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .hint("shuffle_hash")
        .join(cust.hint("shuffle_hash"), col("o_custkey") === col("c_custkey"))
        .select(col("n_name"), col("o_orderkey"))
      t("lineitem").hint("shuffle_hash")
        .join(ord.hint("shuffle_hash"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    // variant: 2 jobs + 1 tiny — fixed dims folded to a literal map on the
    // driver; customer⋈orders via shuffle (stages inside the broadcast-build
    // job); nation name attached via literal map (no extra broadcast job)
    def twoJob(s: SparkSession): DataFrame = {
      import org.apache.spark.sql.functions.{map => sqlMap}
      val asia = t("region").filter(col("r_name") === "ASIA")
        .join(t("nation"), col("n_regionkey") === col("r_regionkey"))
        .select(col("n_nationkey"), col("n_name")).collect()
      val keys = asia.map(r => r.get(0).asInstanceOf[Number].longValue)
      val nameMap = sqlMap(asia.flatMap(r =>
        Seq(lit(r.get(0).asInstanceOf[Number].longValue), lit(r.getString(1)))): _*)
      val cust = t("customer").filter(col("c_nationkey").isin(keys: _*))
        .select(col("c_custkey"), col("c_nationkey")).hint("shuffle_hash")
      val ord = t("orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .hint("shuffle_hash")
        .join(cust, col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey"), col("o_orderkey"))
      t("lineitem")
        .join(broadcast(ord), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("c_nationkey"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .select(nameMap(col("c_nationkey")).as("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    // variant: STAR shape — every dim broadcast INDEPENDENTLY against the
    // lineitem probe. The chained form's broadcast builds are sequential
    // (each child contains the previous join); here all four broadcast
    // children are plain scans, so BroadcastExchangeExec builds them
    // concurrently and ONE probe job runs the whole chain.
    def star(s: SparkSession): DataFrame = {
      val r = t("region").filter(col("r_name") === "ASIA").select(col("r_regionkey"))
      val n = t("nation").select(col("n_nationkey"), col("n_regionkey"), col("n_name"))
      val c = t("customer").select(col("c_custkey"), col("c_nationkey"))
      val o = t("orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .select(col("o_orderkey"), col("o_custkey"))
      t("lineitem")
        .join(broadcast(o), col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(c), col("o_custkey") === col("c_custkey"))
        .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }

    // decomposition probes
    def liScanOnly(s: SparkSession): DataFrame =
      t("lineitem").agg(round(sum(revenue), 2).as("r"))
    def dimChainOnly(s: SparkSession): DataFrame =
      t("region").filter(col("r_name") === "ASIA")
        .join(t("nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t("customer"), col("c_nationkey") === col("n_nationkey"))
        .join(t("orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"))
        .select(col("n_name"), col("o_orderkey"))

    current(spark).collect(); shuffleHash(spark).collect(); dimCollapsed(spark).collect() // warm
    fullShuffle(spark).collect(); twoJob(spark).collect()
    liScanOnly(spark).collect(); dimChainOnly(spark).collect()
    assert(current(spark).collect().toSeq == shuffleHash(spark).collect().toSeq)
    assert(current(spark).collect().toSeq == dimCollapsed(spark).collect().toSeq)
    assert(current(spark).collect().toSeq == fullShuffle(spark).collect().toSeq)
    assert(current(spark).collect().toSeq == twoJob(spark).collect().toSeq)
    star(spark).collect()
    assert(current(spark).collect().toSeq == star(spark).collect().toSeq)
    println(f"star         ${t9(star(spark).collect()) * 1000}%.1f ms")
    println(f"current      ${t9(current(spark).collect()) * 1000}%.1f ms")
    println(f"shuffle_hash ${t9(shuffleHash(spark).collect()) * 1000}%.1f ms")
    println(f"dimCollapsed ${t9(dimCollapsed(spark).collect()) * 1000}%.1f ms")
    println(f"fullShuffle  ${t9(fullShuffle(spark).collect()) * 1000}%.1f ms")
    println(f"twoJob       ${t9(twoJob(spark).collect()) * 1000}%.1f ms")
    println(f"li_scan_agg  ${t9(liScanOnly(spark).collect()) * 1000}%.1f ms")
    println(f"dim_chain    ${t9(dimChainOnly(spark).collect()) * 1000}%.1f ms")
    // planning vs execution split: same plan object collected repeatedly —
    // if this is much cheaper than `current`, the residual is Catalyst
    // analysis/optimization time paid per build, not cluster work
    val prebuilt = current(spark)
    println(f"prebuilt     ${t9(prebuilt.collect()) * 1000}%.1f ms")
    // planning-only: force executedPlan materialization on a fresh build,
    // no execution
    println(f"plan_only    ${t9 { current(spark).queryExecution.executedPlan; () } * 1000}%.1f ms")
    println(f"plan_only_2j ${t9 { twoJob(spark).queryExecution.executedPlan; () } * 1000}%.1f ms")
    println(f"plan_only_b1 ${t9 { liScanOnly(spark).queryExecution.executedPlan; () } * 1000}%.1f ms")
    spark.stop()
  }
}
