package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.queries.RelationalQueries

/** T65–T68 (correlated-subquery family): each SQL-text query must equal
  * the hand-decorrelated DataFrame plan it is documented to become —
  * the parity pins Catalyst's rewrite (semi/anti join, grouped-aggregate
  * join-back, one-row broadcast scalar) to the semantics the scaladoc
  * claims, independently of the driver's DuckDB oracle. */
class SubquerySpec extends SparkSpec {

  private def rows(df: DataFrame): Seq[Seq[Any]] =
    df.collect().toSeq.map(_.toSeq)

  private def tb(n: String): DataFrame = Tables(spark, sf001, n)

  test("t65: EXISTS decorrelates to the left-semi join formulation") {
    val sql = rows(RelationalQueries.t65.build(spark, sf001))
    val manual = tb("orders")
      .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
      .join(tb("lineitem"),
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_semi")
      .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("o_orderpriority"))
    assert(sql.nonEmpty && sql === rows(manual))
  }

  test("t66: correlated scalar avg equals the grouped-aggregate join-back") {
    val sql = rows(RelationalQueries.t66.build(spark, sf001))
    val caps = tb("lineitem").groupBy(col("l_partkey").as("cap_pk"))
      .agg((avg(col("l_quantity")) * 0.2).as("cap"))
    val manual = tb("lineitem")
      .join(tb("part").where(col("p_brand") === "Brand#23"),
        col("p_partkey") === col("l_partkey"))
      .join(caps, col("cap_pk") === col("l_partkey"))
      .where(col("l_quantity") < col("cap"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"))
    assert(sql === rows(manual))
  }

  test("t67: EXISTS + NOT EXISTS equal the semi- then anti-join formulation") {
    val sql = rows(RelationalQueries.t67.build(spark, sf001))
    val late = col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAY")
    val l1 = tb("supplier")
      .join(tb("lineitem"), col("s_suppkey") === col("l_suppkey"))
      .join(tb("orders").where(col("o_orderstatus") === "F"),
        col("o_orderkey") === col("l_orderkey"))
      .where(late)
    val l2 = tb("lineitem")
      .select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = tb("lineitem")
      .select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
        col("l_shipdate").as("d3"))
    val manual = l1
      .join(l2, col("k2") === col("l_orderkey") && col("s2") =!= col("l_suppkey"),
        "left_semi")
      .join(l3, col("k3") === col("l_orderkey") && col("s3") =!= col("l_suppkey") &&
          col("d3") > col("o_orderdate") + expr("INTERVAL 60 DAY"),
        "left_anti")
      .groupBy(col("s_name")).agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name")).limit(20)
    assert(sql.nonEmpty && sql === rows(manual))
  }

  test("t68: scalar threshold + NOT EXISTS equal the broadcast-scalar anti join") {
    val sql = rows(RelationalQueries.t68.build(spark, sf001))
    val thr = tb("customer").where(col("c_acctbal") > 0.0)
      .agg(avg(col("c_acctbal"))).first().getDouble(0)
    val manual = tb("customer")
      .where(col("c_acctbal") > thr)
      .join(tb("orders")
          .where(col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("o_custkey") === col("c_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), round(sum(col("c_acctbal")), 2).as("totacctbal"))
      .orderBy(col("c_mktsegment"))
    assert(sql.nonEmpty && sql === rows(manual))
  }
}
