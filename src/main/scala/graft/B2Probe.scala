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

    def t9(f: => Unit): Double = (1 to 9).map { _ =>
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }.sorted.apply(2)

    current(spark).collect(); shuffleHash(spark).collect() // warm
    assert(current(spark).collect().toSeq == shuffleHash(spark).collect().toSeq)
    println(f"current      ${t9(current(spark).collect()) * 1000}%.1f ms")
    println(f"shuffle_hash ${t9(shuffleHash(spark).collect()) * 1000}%.1f ms")
    spark.stop()
  }
}
