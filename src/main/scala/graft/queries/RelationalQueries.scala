package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** T4–T25 (SURVEY.md §2.2–2.6): predicates, join semantics, aggregation,
  * window functions, sort/limit/set ops — each hash-matched vs DuckDB. */
object RelationalQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val t4 = GQuery(
    "t4_predicates",
    (s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(1000, 50000) &&
          col("o_orderstatus") =!= "P")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"), col("o_orderpriority"))
        .orderBy(col("o_orderkey"))
        .limit(50),
    Some("""SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH')
        AND o_totalprice BETWEEN 1000 AND 50000
        AND o_orderstatus <> 'P'
      ORDER BY o_orderkey LIMIT 50"""))

  private val bandExpr =
    when(col("c_acctbal") < 0, "neg")
      .when(col("c_acctbal") < 2500, "low")
      .when(col("c_acctbal") < 5000, "mid")
      .when(col("c_acctbal") < 7500, "high")
      .otherwise("top")

  val t5 = GQuery(
    "t5_case_bands",
    (s, dir) =>
      t(s, dir, "customer")
        .groupBy(bandExpr.as("band"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("c_acctbal")), 2).as("total_bal"))
        .orderBy(col("band")),
    Some("""SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 2500 THEN 'low'
        WHEN c_acctbal < 5000 THEN 'mid' WHEN c_acctbal < 7500 THEN 'high' ELSE 'top' END AS band,
      count(*) AS cnt, round(sum(c_acctbal), 2) AS total_bal
      FROM customer GROUP BY 1 ORDER BY band"""))

  val t6 = GQuery(
    "t6_outer_join",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val lj = c.join(o, col("o_custkey") === col("c_custkey"), "left")
        .where(col("o_orderkey").isNull)
        .agg(count(lit(1)).as("left_join_no_orders"))
      val rj = o.join(c, col("o_custkey") === col("c_custkey"), "right")
        .where(col("o_orderkey").isNull)
        .agg(count(lit(1)).as("right_join_no_orders"))
      lj.crossJoin(rj)
    },
    Some("""SELECT
      (SELECT count(*) FROM customer LEFT JOIN orders ON o_custkey = c_custkey WHERE o_orderkey IS NULL) AS left_join_no_orders,
      (SELECT count(*) FROM orders RIGHT JOIN customer ON o_custkey = c_custkey WHERE o_orderkey IS NULL) AS right_join_no_orders"""))

  val t7 = GQuery(
    "t7_full_outer",
    (s, dir) => {
      val ck = t(s, dir, "customer").select(col("c_custkey").as("ck")).distinct()
      val ok = t(s, dir, "orders").select(col("o_custkey").as("ok")).distinct()
      ck.join(ok, col("ck") === col("ok"), "full")
        .agg(
          sum(when(col("ck").isNotNull && col("ok").isNotNull, 1).otherwise(0)).as("matched"),
          sum(when(col("ok").isNull, 1).otherwise(0)).as("customer_only"),
          sum(when(col("ck").isNull, 1).otherwise(0)).as("order_only"))
    },
    Some("""SELECT
      CAST(sum(CASE WHEN ck IS NOT NULL AND ok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
      CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS customer_only,
      CAST(sum(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS order_only
      FROM (SELECT DISTINCT c_custkey AS ck FROM customer) c
      FULL JOIN (SELECT DISTINCT o_custkey AS ok FROM orders) o ON ck = ok"""))

  val t8 = GQuery(
    "t8_theta_join",
    (s, dir) =>
      t(s, dir, "lineitem")
        .join(t(s, dir, "part"),
          col("l_partkey") === col("p_partkey") && col("l_quantity") > col("p_size"))
        .agg(count(lit(1)).as("pairs")),
    Some("""SELECT count(*) AS pairs FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_quantity > p_size"""))

  val t9 = GQuery(
    "t9_broadcast_join",
    (s, dir) => {
      val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .join(t(s, dir, "orders").filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(t(s, dir, "customer")), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region").filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    // Must hash-match B2 (same semantics, explicit broadcast hints).
    BenchQueries.b2.oracle)

  // Bloom-pruned join: fact rows are filtered through a bloom filter of
  // the dim keys BEFORE any shuffle (operators.BloomOps). False positives
  // are removed by the real join, so this must hash-match the plain-join
  // oracle exactly.
  val t9b = GQuery(
    "t9b_bloom_join",
    (s, dir) => {
      val highBal = t(s, dir, "customer").where(col("c_acctbal") > 7000)
        .select(col("c_custkey"), col("c_mktsegment"))
      graft.operators.BloomOps
        .bloomPrunedJoin(t(s, dir, "orders"), highBal, "o_custkey", "c_custkey")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""SELECT c_mktsegment, count(*) AS n_orders,
      round(sum(o_totalprice), 2) AS total
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE c_acctbal > 7000
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  val t10 = GQuery(
    "t10_interval_join",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), unix_micros(col("ts")).as("us"))
      val e1 = ev.select(col("user_id").as("u1"), col("us").as("us1"))
      val e2 = ev.select(col("user_id").as("u2"), col("us").as("us2"))
      e1.join(e2, col("u1") === col("u2") && col("us2") > col("us1") &&
          col("us2") <= col("us1") + lit(300000000L))
        .agg(count(lit(1)).as("pairs"))
    },
    Some("""SELECT count(*) AS pairs FROM
      (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us1 FROM events) e1
      JOIN (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us2 FROM events) e2
      ON e1.user_id = e2.user_id AND us2 > us1 AND us2 <= us1 + 300000000"""))

  // Same semantics as t10 through the scale path: equi-join on w-sized time
  // buckets (operators.IntervalJoin) instead of the nested-loop range join —
  // must hash-match t10's oracle.
  val t10b = GQuery(
    "t10b_bucketed_interval",
    (s, dir) => {
      val ev = t(s, dir, "events").select(col("user_id"), unix_micros(col("ts")).as("us"))
      graft.operators.IntervalJoin.within(ev, ev, Seq("user_id"), "us", 300000000L)
        .agg(count(lit(1)).as("pairs"))
    },
    t10.oracle)

  val t11 = GQuery(
    "t11_cube",
    (s, dir) =>
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first),
    Some("""SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  val t12 = GQuery(
    "t12_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT o_orderstatus, o_orderpriority, CAST(grouping_id() AS BIGINT) AS gid, count(*) AS cnt
        FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""")
    },
    Some("""SELECT o_orderstatus, o_orderpriority,
      CAST(GROUPING(o_orderstatus) * 2 + GROUPING(o_orderpriority) AS BIGINT) AS gid, count(*) AS cnt
      FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""))

  val t13 = GQuery(
    "t13_having",
    (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("cnt"))
        .where(col("cnt") > 100)
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, count(*) AS cnt FROM customer
      GROUP BY c_mktsegment HAVING count(*) > 100 ORDER BY c_mktsegment"""))

  val t14 = GQuery(
    "t14_distinct",
    (s, dir) =>
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus")).distinct()
        .orderBy(col("l_returnflag"), col("l_linestatus")),
    Some("""SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""))

  val t15 = GQuery(
    "t15_max_by",
    (s, dir) =>
      t(s, dir, "customer")
        .groupBy(col("c_mktsegment"))
        .agg(max_by(col("c_name"), struct(col("c_acctbal"), -col("c_custkey"))).as("top_name"),
          round(max(col("c_acctbal")), 2).as("top_bal"))
        .orderBy(col("c_mktsegment")),
    Some("""SELECT c_mktsegment, top_name, round(top_bal, 2) AS top_bal FROM (
      SELECT c_mktsegment, c_name AS top_name,
             max(c_acctbal) OVER (PARTITION BY c_mktsegment) AS top_bal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn = 1 ORDER BY c_mktsegment"""))

  val t16 = GQuery(
    "t16_percentiles",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("percentile(o_totalprice, 0.5)"), 2).as("median_price"),
          round(expr("percentile(o_totalprice, 0.9)"), 2).as("p90_price"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 2) AS median_price,
      round(quantile_cont(o_totalprice, 0.9), 2) AS p90_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  val t17 = GQuery(
    "t17_collect_set",
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"))
        .orderBy(col("user_id"))
        .limit(50),
    Some("""SELECT user_id, array_to_string(list_sort(list_distinct(list(event_type))), ',') AS types
      FROM events GROUP BY user_id ORDER BY user_id LIMIT 50"""))

  val t18 = GQuery(
    "t18_rank",
    (s, dir) => {
      val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice").desc)
      t(s, dir, "part")
        .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
          rank().over(w).as("rnk"), dense_rank().over(w).as("drnk"))
        .orderBy(col("p_brand"), col("rnk"), col("p_partkey"))
        .limit(100)
    },
    Some("""SELECT p_brand, p_partkey, p_retailprice,
      rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
      dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
      FROM part ORDER BY p_brand, rnk, p_partkey LIMIT 100"""))

  val t19 = GQuery(
    "t19_ntile",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").asc, col("c_custkey").asc)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_acctbal"), ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w), 4).as("pr"))
        .groupBy(col("c_mktsegment"), col("quartile"))
        .agg(count(lit(1)).as("cnt"), round(min(col("c_acctbal")), 2).as("min_bal"),
          round(max(col("c_acctbal")), 2).as("max_bal"), round(max(col("pr")), 4).as("max_pr"))
        .orderBy(col("c_mktsegment"), col("quartile"))
    },
    Some("""SELECT c_mktsegment, quartile, count(*) AS cnt,
      round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal,
      round(max(pr), 4) AS max_pr
      FROM (SELECT c_mktsegment, c_acctbal,
              ntile(4) OVER w AS quartile, round(percent_rank() OVER w, 4) AS pr
            FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
      GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile"""))

  val t20 = GQuery(
    "t20_first_last",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("user_id"),
          first(col("event_type")).over(w).as("first_type"),
          last(col("event_type")).over(w).as("last_type"))
        .distinct()
        .orderBy(col("user_id"))
        .limit(100)
    },
    Some("""SELECT DISTINCT user_id,
      first_value(event_type) OVER w AS first_type,
      last_value(event_type) OVER w AS last_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id LIMIT 100"""))

  val t21 = GQuery(
    "t21_moving_avg",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(date_trunc("day", col("o_orderdate")).as("day"))
        .agg(round(sum(col("o_totalprice")), 2).as("day_total"))
      val w = Window.orderBy(col("day")).rowsBetween(-2, 0)
      daily.select(col("day"), col("day_total"),
          round(avg(col("day_total")).over(w), 2).as("ma3"))
        .orderBy(col("day"))
        .limit(200)
    },
    Some("""SELECT day, day_total,
      round(avg(day_total) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
      FROM (SELECT CAST(date_trunc('day', o_orderdate) AS TIMESTAMP) AS day,
                   round(sum(o_totalprice), 2) AS day_total
            FROM orders GROUP BY 1)
      ORDER BY day LIMIT 200"""))

  val t22 = GQuery(
    "t22_range_frame",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-3600000000L, 0)
      t(s, dir, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("us"))
        .select(col("user_id"), col("event_id"), count(lit(1)).over(w).as("events_last_hour"))
        .orderBy(col("user_id"), col("event_id"))
        .limit(200)
    },
    Some("""SELECT user_id, event_id,
      count(*) OVER (PARTITION BY user_id ORDER BY epoch_us(CAST(ts AS TIMESTAMP))
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS events_last_hour
      FROM events ORDER BY user_id, event_id LIMIT 200"""))

  val t23 = GQuery(
    "t23_offset",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .offset(100)
        .limit(50),
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 50 OFFSET 100"""))

  val t24 = GQuery(
    "t24_union",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val a = o.where(col("o_totalprice") < 150000).select(col("o_orderkey"))
      val b = o.where(col("o_totalprice") > 50000).select(col("o_orderkey"))
      val ua = a.unionAll(b).agg(count(lit(1)).as("union_all_cnt"))
      val ud = a.union(b).distinct().agg(count(lit(1)).as("union_distinct_cnt"))
      ua.crossJoin(ud)
    },
    Some("""SELECT
      (SELECT count(*) FROM (SELECT o_orderkey FROM orders WHERE o_totalprice < 150000
        UNION ALL SELECT o_orderkey FROM orders WHERE o_totalprice > 50000) t) AS union_all_cnt,
      (SELECT count(*) FROM (SELECT o_orderkey FROM orders WHERE o_totalprice < 150000
        UNION SELECT o_orderkey FROM orders WHERE o_totalprice > 50000) t) AS union_distinct_cnt"""))

  val t25 = GQuery(
    "t25_except",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.where(col("o_orderstatus") === "O").select(col("o_custkey"))
        .except(o.where(col("o_orderstatus") === "F").select(col("o_custkey")))
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t"""))

  /** W3 completion: cume_dist alongside percent_rank/ntile. */
  val t19b = GQuery(
    "t19b_cume_dist",
    (s, dir) => {
      val w = Window.partitionBy(col("c_mktsegment")).orderBy(col("c_acctbal").asc)
      t(s, dir, "customer")
        .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy(col("c_mktsegment"), col("c_acctbal"), col("c_custkey"))
        .limit(100)
    },
    Some("""SELECT c_mktsegment, c_custkey, c_acctbal,
      round(cume_dist() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal), 6) AS cd
      FROM customer ORDER BY c_mktsegment, c_acctbal, c_custkey LIMIT 100"""))

  /** Pivot: long→wide with an explicit value list (deterministic column
    * set; Catalyst turns it into one aggregation pass, no per-value scans).
    * Empty cells surface as NULL in Spark's pivot — coalesced to 0 to match
    * the FILTER-count oracle. */
  val t30 = GQuery(
    "t30_pivot",
    (s, dir) => {
      val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
      val wide = t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .pivot("o_orderpriority", prios)
        .agg(count(lit(1)))
      wide.select(
        col("o_orderstatus") +:
          prios.zipWithIndex.map { case (p, i) =>
            coalesce(col(s"`$p`"), lit(0L)).as(s"p${i + 1}") }: _*)
        .orderBy(col("o_orderstatus"))
    },
    Some("""SELECT o_orderstatus,
      count(*) FILTER (o_orderpriority = '1-URGENT') AS p1,
      count(*) FILTER (o_orderpriority = '2-HIGH') AS p2,
      count(*) FILTER (o_orderpriority = '3-MEDIUM') AS p3,
      count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED') AS p4,
      count(*) FILTER (o_orderpriority = '5-LOW') AS p5
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** Unpivot: wide→long (Dataset.unpivot, Spark's UNPIVOT plan — one scan,
    * no self-union). */
  val t31 = GQuery(
    "t31_unpivot",
    (s, dir) =>
      t(s, dir, "part")
        .unpivot(
          Array(col("p_partkey")),
          Array(col("p_size").cast("double").as("p_size"), col("p_retailprice")),
          "metric", "value")
        .orderBy(col("p_partkey"), col("metric"))
        .limit(200),
    Some("""SELECT p_partkey, metric, value FROM (
      SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS DOUBLE) AS value FROM part
      UNION ALL
      SELECT p_partkey, 'p_retailprice' AS metric, p_retailprice AS value FROM part)
      ORDER BY p_partkey, metric LIMIT 200"""))

  /** Correlated scalar subquery (orders priced above 2× their customer's
    * average). The DataFrame side is the decorrelated plan Catalyst would
    * produce — group-by average joined back on the correlation key; the
    * subquery form runs as SQL text (SqlQueries) and as the DuckDB oracle.
    * The average is rounded to 2dp on both sides BEFORE the comparison so
    * engine float-summation-order differences can't flip the predicate. */
  val t32 = GQuery(
    "t32_scalar_subquery",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val avgPer = o.groupBy(col("o_custkey").as("ak"))
        .agg(round(avg(col("o_totalprice")), 2).as("avg_price"))
      o.join(avgPer, col("o_custkey") === col("ak"))
        .where(col("o_totalprice") > lit(2) * col("avg_price"))
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey"))
        .limit(100)
    },
    Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      WHERE o_totalprice > 2 * round(
        (SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey), 2)
      ORDER BY o_orderkey LIMIT 100"""))

  /** Correlated EXISTS / NOT EXISTS — decorrelated as semi + anti join. */
  val t33 = GQuery(
    "t33_exists",
    (s, dir) => {
      val c = t(s, dir, "customer")
      val o = t(s, dir, "orders")
      val urgent = o.where(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("uk"))
      val finished = o.where(col("o_orderstatus") === "F").select(col("o_custkey").as("fk"))
      c.join(urgent, col("c_custkey") === col("uk"), "left_semi")
        .join(finished, col("c_custkey") === col("fk"), "left_anti")
        .agg(count(lit(1)).as("n"))
    },
    Some("""SELECT count(*) AS n FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')"""))

  /** IN / NOT IN subquery (keys are non-null, so NOT IN is anti-join-safe). */
  val t34 = GQuery(
    "t34_in_subquery",
    (s, dir) => {
      val keys = t(s, dir, "lineitem").where(col("l_quantity") >= 45).select(col("l_partkey"))
      val p = t(s, dir, "part")
      val inCnt = p.join(keys, col("p_partkey") === col("l_partkey"), "left_semi")
        .agg(count(lit(1)).as("in_cnt"))
      val notInCnt = p.join(keys, col("p_partkey") === col("l_partkey"), "left_anti")
        .agg(count(lit(1)).as("not_in_cnt"))
      inCnt.crossJoin(notInCnt)
    },
    Some("""SELECT
      (SELECT count(*) FROM part WHERE p_partkey IN
        (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)) AS in_cnt,
      (SELECT count(*) FROM part WHERE p_partkey NOT IN
        (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)) AS not_in_cnt"""))

  /** LATERAL join (top-2 orders per customer) — decorrelated as the ranked
    * window + join, which is also the plan that scales: the per-group LIMIT
    * runs inside one window pass, no per-customer re-scan of orders. */
  val t35 = GQuery(
    "t35_lateral",
    (s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val top2 = t(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 2)
      t(s, dir, "customer").where(col("c_custkey") < 25).select(col("c_custkey"))
        .join(top2, col("c_custkey") === col("o_custkey"))
        .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("c_custkey"), col("o_totalprice").desc, col("o_orderkey"))
    },
    Some("""SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey < 25
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey"""))

  /** Multi-CTE composition: per-customer order rollup reused by a segment
    * rollup; LEFT JOIN keeps order-less customers with zeroed metrics. */
  val t36 = GQuery(
    "t36_cte",
    (s, dir) => {
      val cnt = t(s, dir, "orders").groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice")).as("tot"))
      t(s, dir, "customer").join(cnt, col("o_custkey") === col("c_custkey"), "left")
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("customers"),
          sum(coalesce(col("n"), lit(0L))).as("orders_cnt"),
          round(sum(coalesce(col("tot"), lit(0.0))), 2).as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some("""WITH cnt AS (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS tot
        FROM orders GROUP BY o_custkey)
      SELECT c_mktsegment, count(*) AS customers,
        CAST(sum(coalesce(n, 0)) AS BIGINT) AS orders_cnt,
        round(sum(coalesce(tot, 0)), 2) AS revenue
      FROM customer LEFT JOIN cnt ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** W5 completion: IGNORE NULLS (last non-error event) + nth_value. */
  val t37 = GQuery(
    "t37_ignore_nulls",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, dir, "events")
        .select(col("user_id"),
          last(nullif(col("event_type"), lit("error")), ignoreNulls = true).over(w).as("last_ok_type"),
          nth_value(col("event_type"), 2).over(w).as("second_type"))
        .distinct()
        .orderBy(col("user_id"))
        .limit(100)
    },
    Some("""SELECT DISTINCT user_id,
      last_value(nullif(event_type, 'error') IGNORE NULLS) OVER w AS last_ok_type,
      nth_value(event_type, 2) OVER w AS second_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id LIMIT 100"""))

  /** Spark 4 pipe SQL: the SqlQueries twin states this query in `|>`
    * syntax (parser feature — same plan); the oracle is standard SQL. */
  val t38 = GQuery(
    "t38_pipe_sql",
    (s, dir) =>
      t(s, dir, "orders")
        .where(col("o_orderstatus") === "O")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("o_totalprice")), 2).as("total"))
        .orderBy(col("o_orderpriority")),
    Some("""SELECT o_orderpriority, count(*) AS cnt, round(sum(o_totalprice), 2) AS total
      FROM orders WHERE o_orderstatus = 'O'
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** ANSI-safe functions: Spark 4 runs ANSI mode by default (bad casts and
    * 0/0 THROW), so the try_* family is the production-safe surface for
    * dirty data. try_divide's null-on-zero maps to DuckDB `/ nullif`. */
  val t39 = GQuery(
    "t39_try_functions",
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"),
          substring(col("o_orderpriority"), 1, 1).try_cast("int").as("prio_num"),
          col("o_orderstatus").try_cast("int").as("bad_int"),
          round(try_divide(col("o_totalprice"), col("o_orderkey") % 3), 2).as("div3"),
          lit("2024-13-45").try_cast("date").as("bad_date"))
        .orderBy(col("o_orderkey"))
        .limit(100),
    Some("""SELECT o_orderkey,
      TRY_CAST(substring(o_orderpriority, 1, 1) AS INTEGER) AS prio_num,
      TRY_CAST(o_orderstatus AS INTEGER) AS bad_int,
      round(o_totalprice / nullif(o_orderkey % 3, 0), 2) AS div3,
      TRY_CAST('2024-13-45' AS DATE) AS bad_date
      FROM orders ORDER BY o_orderkey LIMIT 100"""))

  /** T63 LOCAL SUPPLIER VOLUME (the TPC-H Q5 shape): 6-way star join
    * with the classic second equi-condition — the supplying and buying
    * nation must coincide (`c_nationkey = s_nationkey`), which no single
    * join key carries. Plan shape for 100 TB: region⋈nation⋈customer⋈
    * filtered-orders reduce into one narrow frame probed against
    * lineitem (the only big-table scan), then supplier joined with the
    * nation-match as the second condition. The reduced frame and
    * supplier both GROW with the fact tables (one row per qualifying
    * order / per supplier), so neither gets an unconditional broadcast:
    * [[graft.operators.JoinHints.broadcastIfSmall]] measures each with a
    * bounded probe and broadcasts below 1M rows (the graded-SF plan),
    * falling back to a spillable `shuffle_hash` build above it — the
    * same contract B2's hint documents. Lineitem is scanned once and,
    * on the broadcast path, never shuffled; the only exchange is the
    * final tiny n_name rollup. */
  val t63 = GQuery(
    "t63_local_supplier_volume",
    (s, dir) => {
      val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val small = t(s, dir, "region").filter(col("r_name") === "EUROPE")
        .join(t(s, dir, "nation"), col("n_regionkey") === col("r_regionkey"))
        .join(t(s, dir, "customer"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
          col("o_custkey") === col("c_custkey"))
        .select(col("n_name"), col("c_nationkey"), col("o_orderkey"))
        // lazy checkpoint: the 4-way reduction materializes ONCE (on the
        // gate's probe) and both the probe and the join read the cached
        // partitions — without it the reduction would run twice (probe +
        // join), a full extra pass at 100 TB
        .localCheckpoint(false)
      t(s, dir, "lineitem")
        .join(graft.operators.JoinHints.broadcastIfSmall(small),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(t(s, dir, "supplier")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .groupBy(col("n_name"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    },
    Some("""SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM region
      JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      WHERE r_name = 'EUROPE'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name"""))

  /** T64 TOP RETURNED-REVENUE CUSTOMERS (the TPC-H Q10 shape): which
    * customers returned the most revenue in a window — fact-side filter
    * (`l_returnflag = 'R'`) FIRST, per-customer rollup on the reduced
    * fact, dims joined AFTER the aggregation so the shuffle carries one
    * row per customer, not one per lineitem; top-20 is a TakeOrdered,
    * not a global sort. Customer grows linearly with SF (~1.5B rows at
    * 100 TB TPC-H), so its broadcast is size-gated
    * ([[graft.operators.JoinHints.broadcastIfSmall]]: broadcast at the
    * graded SF, spillable `shuffle_hash` build beyond the bound);
    * nation's 25 rows stay unconditionally broadcast. */
  val t64 = GQuery(
    "t64_returned_revenue",
    (s, dir) => {
      val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val perCust = t(s, dir, "lineitem").filter(col("l_returnflag") === "R")
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_custkey"))
        .agg(round(sum(revenue), 2).as("revenue"))
      perCust
        // no checkpoint here: customer is a RAW SCAN — recomputing it for
        // the gate's probe is one column-pruned read, cheaper than
        // materializing the table (contrast t63's derived reduction)
        .join(graft.operators.JoinHints.broadcastIfSmall(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("c_name"), col("n_name"), col("revenue"))
        .orderBy(col("revenue").desc, col("c_custkey"))
        .limit(20)
    },
    Some("""SELECT c_custkey, c_name, n_name,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate < TIMESTAMP '1998-01-01'
      GROUP BY c_custkey, c_name, n_name
      ORDER BY revenue DESC, c_custkey LIMIT 20"""))

  /** T65 PRIORITY COUNT OF LATE ORDERS (the TPC-H Q4 shape): orders in a
    * half-year window with at least one lineitem shipping >60 days after
    * order date, counted per priority. Written as a correlated EXISTS on
    * PURPOSE — the query-surface story here is Catalyst's decorrelation
    * (`RewritePredicateSubquery`): the subquery becomes ONE left-semi
    * join on `l_orderkey` whose join condition carries the non-equi
    * date-shift predicate, so lineitem is scanned once and each order
    * row survives at most once (no EXISTS re-execution per row, no
    * fan-out to dedupe). At 100 TB the date window prunes orders before
    * the shuffle and the semi join's build/stream sides both reduce
    * map-side; the final rollup shuffles five groups. */
  val t65 = GQuery(
    "t65_exists_late_orders",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT o_orderpriority, count(*) AS cnt
        FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1996-07-01'
          AND EXISTS (SELECT 1 FROM lineitem
                      WHERE l_orderkey = o_orderkey
                        AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    },
    Some("""SELECT o_orderpriority, count(*) AS cnt
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate < TIMESTAMP '1996-07-01'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey
                      AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY o_orderpriority ORDER BY o_orderpriority"""))

  /** T66 SMALL-QUANTITY REVENUE (the TPC-H Q17 shape): revenue from
    * lineitems under 20% of their part's average quantity, one brand.
    * The correlated SCALAR subquery is the point:
    * `RewriteCorrelatedScalarSubquery` turns the per-row "avg for THIS
    * part" into ONE grouped aggregate over lineitem keyed on
    * `l_partkey`, joined back — lineitem is scanned twice (outer +
    * aggregate), never once per row, and the aggregate side reduces
    * map-side to one row per part before its shuffle. The brand filter
    * cannot prune the aggregate side (the average is over ALL lineitems
    * of the part, only resolvable per part), so at 100 TB the aggregate
    * input is the full fact — exactly the documented Q17 cost, with the
    * partial agg as the lever. */
  val t66 = GQuery(
    "t66_scalar_subquery_qty",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "part").createOrReplaceTempView("part")
      s.sql("""SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem l JOIN part ON p_partkey = l.l_partkey
        WHERE p_brand = 'Brand#23'
          AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                              FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)""")
    },
    Some("""SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
      FROM lineitem l JOIN part ON p_partkey = l.l_partkey
      WHERE p_brand = 'Brand#23'
        AND l.l_quantity < (SELECT 0.2 * avg(l2.l_quantity)
                            FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)"""))

  /** T67 SOLE LATE SUPPLIER (the TPC-H Q21 shape): suppliers who were
    * the ONLY late shipper on a finished multi-supplier order ("late" =
    * shipped >60 days after order date; the fixtures carry no
    * commit/receipt dates). Doubly-correlated: an EXISTS (some OTHER
    * supplier on the order) and a NOT EXISTS (no OTHER supplier late) —
    * the NOT EXISTS predicate references the OUTER order's date, which
    * decorrelation must carry into the anti-join condition. Plan:
    * `RewritePredicateSubquery` plans one left-semi and one left-anti
    * join, both keyed on `l_orderkey` with the `<>`-supplier and
    * date-shift residuals in the join condition — three scans of
    * lineitem total (outer + two subqueries), zero per-row re-execution,
    * and every join is an equi-join on the order key so AQE's skew
    * handling applies to hot orders. */
  val t67 = GQuery(
    "t67_only_late_supplier",
    (s, dir) => {
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT s_name, count(*) AS numwait FROM supplier
        JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
        JOIN orders ON o_orderkey = l1.l_orderkey
        WHERE o_orderstatus = 'F'
          AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""")
    },
    Some("""SELECT s_name, count(*) AS numwait FROM supplier
      JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
      JOIN orders ON o_orderkey = l1.l_orderkey
      WHERE o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey
                      AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey
                          AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20"""))

  /** T68 DORMANT HIGH-BALANCE CUSTOMERS (the TPC-H Q22 shape):
    * above-average-balance customers with no order since 2000, rolled up
    * by segment. Two subquery forms in one query: the UNCORRELATED
    * scalar (global positive-balance average) plans as a one-row
    * subquery result broadcast into the filter — computed once, never
    * per row; the correlated NOT EXISTS decorrelates to a left-anti join
    * on `o_custkey` against the date-filtered orders. At 100 TB the
    * anti join's right side is pruned by the date predicate BEFORE its
    * shuffle, and the scalar's aggregate is one map-side-combined pass
    * over customer. */
  val t68 = GQuery(
    "t68_dormant_customers",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql("""SELECT c_mktsegment, count(*) AS numcust,
          round(sum(c_acctbal), 2) AS totacctbal
        FROM customer
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                           WHERE c_acctbal > 0.0)
          AND NOT EXISTS (SELECT 1 FROM orders
                          WHERE o_custkey = c_custkey
                            AND o_orderdate >= TIMESTAMP '2000-01-01')
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    },
    Some("""SELECT c_mktsegment, count(*) AS numcust,
        round(sum(c_acctbal), 2) AS totacctbal
      FROM customer
      WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer
                         WHERE c_acctbal > 0.0)
        AND NOT EXISTS (SELECT 1 FROM orders
                        WHERE o_custkey = c_custkey
                          AND o_orderdate >= TIMESTAMP '2000-01-01')
      GROUP BY c_mktsegment ORDER BY c_mktsegment"""))

  /** T69 ROLLING BIVARIATE CORRELATION (W15): per-supplier correlation of
    * price vs quantity over a 7-row sliding frame — the bivariate twin of
    * W7's moving average, the shape behind rolling beta / factor drift
    * monitors. One window shuffle on `l_suppkey` (real key, thousands of
    * partitions at scale — never a global or 3-group window), frame state
    * is the co-moment accumulator, then one map-side-combined rollup per
    * supplier. Frames shorter than 2 rows (partition heads) yield NULL in
    * both engines and fall out of avg/count identically. */
  val t69 = GQuery(
    "t69_rolling_corr",
    (s, dir) => {
      val w = Window.partitionBy(col("l_suppkey"))
        .orderBy(col("l_shipdate"), col("l_orderkey"), col("l_linenumber"))
        .rowsBetween(-6, 0)
      // corr spelled out as covar_samp/(sx·sy) with an explicit
      // zero-variance guard: Spark's corr aggregate divides by the
      // co-moment product, which under ANSI mode THROWS on a
      // constant-valued frame (quantity is discrete — same-value runs
      // happen); DuckDB's corr returns NULL there. The guarded form is
      // NULL in both engines for n<2 (covar_samp NULL) and zero
      // variance, and the (n−1) factors cancel so it IS corr.
      val cv = covar_samp(col("l_extendedprice"), col("l_quantity")).over(w)
      val sx = stddev_samp(col("l_extendedprice")).over(w)
      val sy = stddev_samp(col("l_quantity")).over(w)
      t(s, dir, "lineitem")
        .withColumn("rc", when(sx > 0 && sy > 0, cv / (sx * sy)))
        .groupBy(col("l_suppkey"))
        .agg(round(avg(col("rc")), 6).as("avg_rc"),
          round(max(col("rc")), 6).as("max_rc"),
          count(col("rc")).as("n_frames"))
        .orderBy(col("l_suppkey"))
    },
    Some("""SELECT l_suppkey, round(avg(rc), 6) AS avg_rc,
        round(max(rc), 6) AS max_rc, count(rc) AS n_frames
      FROM (SELECT l_suppkey,
              CASE WHEN sx > 0 AND sy > 0 THEN cv / (sx * sy) END AS rc
            FROM (SELECT l_suppkey,
              covar_samp(l_extendedprice, l_quantity) OVER w AS cv,
              stddev_samp(l_extendedprice) OVER w AS sx,
              stddev_samp(l_quantity) OVER w AS sy
            FROM lineitem
            WINDOW w AS (PARTITION BY l_suppkey
              ORDER BY l_shipdate, l_orderkey, l_linenumber
              ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))) t
      GROUP BY l_suppkey ORDER BY l_suppkey"""))

  /** T70 MOVING MEDIAN (W16): per-customer median order value over the
    * last 5 orders — an ORDER-STATISTIC frame aggregate, the robust
    * counterpart of W7's moving average (one outlier order shifts an
    * average, not a median). Spark's exact `percentile` aggregate runs
    * as a window function over the 5-row frame; one window shuffle on
    * the customer key, frame state ≤5 rows, then a per-customer rollup.
    * FULL frames only (`row_number ≥ 5`, same window order): an odd
    * frame's median is an exact data value in both engines, whereas a
    * 2/4-row frame interpolates the two middle 2-dp prices — midpoints
    * land EXACTLY on x.xx5 rounding ties, where a 1-ulp cross-engine
    * difference flips round(…,2) (measured: 15/1500 rows flaked before
    * the full-frame restriction). The rollup SUMS the medians rather
    * than averaging them for the same reason: a sum of 2-dp values is a
    * 2-dp decimal (FP noise ~1e-9 rounds away), while dividing by the
    * frame count manufactures fresh x.xx5 ties (measured: 6/1451). */
  val t70 = GQuery(
    "t70_moving_median",
    (s, dir) => {
      val ord = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
      val w = ord.rowsBetween(-4, 0)
      t(s, dir, "orders")
        .withColumn("mm", expr("percentile(o_totalprice, 0.5D)").over(w))
        .withColumn("rn", row_number().over(ord))
        .where(col("rn") >= 5)
        .groupBy(col("o_custkey"))
        .agg(round(sum(col("mm")), 2).as("sum_mm"),
          round(max(col("mm")), 2).as("max_mm"),
          count(lit(1)).as("n_frames"))
        .orderBy(col("o_custkey"))
    },
    Some("""SELECT o_custkey, round(sum(mm), 2) AS sum_mm,
        round(max(mm), 2) AS max_mm, count(*) AS n_frames
      FROM (SELECT o_custkey,
              median(o_totalprice) OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS mm,
              row_number() OVER (
                PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS rn
            FROM orders) t
      WHERE rn >= 5
      GROUP BY o_custkey ORDER BY o_custkey"""))

  /** T74 TOP QUARTERLY SUPPLIER (the TPC-H Q15 shape): the supplier(s)
    * whose Q1-1996 shipped revenue equals the maximum over all suppliers
    * — the "view + scalar max over the view" pattern. The subquery
    * surface under test: the CTE is referenced twice (join input and the
    * scalar's aggregate) and Spark INLINES it, so the plan is two
    * map-side-combined aggregations over the date-pruned fact — each one
    * shuffles one row per supplier — with the max as a ONE-ROW broadcast
    * into the filter, never a per-row re-execution; the supplier dim
    * then broadcasts onto the one-row-per-supplier revenue side. Revenue
    * is rounded to 2 dp BEFORE the max/equality compare in BOTH engines
    * so the tie set is decided on identical decimals, not on 1-ulp FP
    * noise. At 100 TB the shape holds (the fact is scanned twice — the
    * documented Q15 cost; caching the rollup is the caller's lever). */
  val t74 = GQuery(
    "t74_top_supplier",
    (s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("supplier")
      s.sql("""WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
            round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_revenue
        FROM supplier JOIN revenue ON s_suppkey = supplier_no
        WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
        ORDER BY s_suppkey""")
    },
    Some("""WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
          round(sum(l_extendedprice * (1 - l_discount)), 2) AS total_revenue
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1996-04-01'
        GROUP BY l_suppkey)
      SELECT s_suppkey, s_name, total_revenue
      FROM supplier JOIN revenue ON s_suppkey = supplier_no
      WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
      ORDER BY s_suppkey"""))

  /** T75 LARGE-VOLUME ORDERS (the TPC-H Q18 shape): orders whose total
    * lineitem quantity exceeds 150, with customer detail and the
    * quantity rollup repeated in the outer query. The IN-subquery over a
    * GROUPED HAVING is the point: Spark decorrelates it to a left-semi
    * join against the one-row-per-order aggregate — the fact reduces
    * map-side to |orders| rows BEFORE the semi join's shuffle, and the
    * HAVING prunes that to the handful of heavy orders, so the
    * semi-join build side is tiny and AQE broadcasts it. Quantities are
    * integer-valued, so the >150 threshold and the output sum are exact
    * in both engines. The outer re-aggregation then groups the few
    * surviving orders; customer broadcasts onto them. */
  val t75 = GQuery(
    "t75_large_volume_orders",
    (s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("customer")
      t(s, dir, "orders").createOrReplaceTempView("orders")
      t(s, dir, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
          round(sum(l_quantity), 2) AS total_qty
        FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
        WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                             GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
        GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 20""")
    },
    Some("""SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        round(sum(l_quantity), 2) AS total_qty
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON o_orderkey = l_orderkey
      WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem
                           GROUP BY l_orderkey HAVING sum(l_quantity) > 150)
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 20"""))

  /** T76 SHIPPING PRIORITY (the TPC-H Q3 shape): top-10 unshipped orders
    * by revenue for one market segment. Plan for 100 TB: the
    * segment-filtered customer reduces date-filtered orders FIRST — that
    * derived (orderkey, orderdate) frame is lazily checkpointed so the
    * size-gate probe and the join read one materialization — then probes
    * the shipdate-filtered fact as a broadcast (graded SF) or spillable
    * shuffle_hash build (beyond the gate). Revenue is rounded to 2 dp
    * BEFORE the ordering in both engines: products are 4-dp decimals
    * whose double sums agree far above a cent, while the raw sums can
    * differ by an ulp across engines and flip the top-10 cut. Top-10 is
    * a TakeOrdered over the per-order rollup, never a global sort. */
  val t76 = GQuery(
    "t76_shipping_priority",
    (s, dir) => {
      val revenue = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val cutoff = lit("1998-06-30").cast("timestamp")
      val openOrders = t(s, dir, "customer")
        .filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey"))
        .join(t(s, dir, "orders").filter(col("o_orderdate") < cutoff),
          col("c_custkey") === col("o_custkey"))
        .select(col("o_orderkey"), col("o_orderdate"))
        .localCheckpoint(false) // probe + join share one materialization
      t(s, dir, "lineitem").filter(col("l_shipdate") > cutoff)
        .join(graft.operators.JoinHints.broadcastIfSmall(openOrders),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_orderkey"), col("o_orderdate"))
        .agg(round(sum(revenue), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey, o_orderdate,
        round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-30'
        AND l_shipdate > TIMESTAMP '1998-06-30'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey LIMIT 10"""))

  /** T77 FORECAST REVENUE CHANGE (the TPC-H Q6 shape): what revenue
    * would appear if low-quantity discounts in one year were dropped —
    * a single-table filter + global aggregate, THE pushdown litmus: all
    * three predicates (shipdate range, discount band, quantity cap)
    * reach the parquet scan as PushedFilters over a 3-column ReadSchema,
    * the sum combines map-side, and ONE row crosses the wire. At 100 TB
    * this query's cost is the pruned scan and nothing else. */
  val t77 = GQuery(
    "t77_forecast_revenue",
    (s, dir) =>
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
          col("l_discount").between(0.04, 0.06) && col("l_quantity") < 24)
        .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2).as("revenue")),
    Some("""SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
        AND l_discount BETWEEN 0.04 AND 0.06 AND l_quantity < 24"""))

  /** T78 VOLUME SHIPPING (the TPC-H Q7 shape): bilateral trade volume
    * between two nations by year. Join-ORDER is the scale story: the
    * supplier⋈nation frame filtered to the two nations broadcasts onto
    * the shipdate-pruned fact FIRST (cutting it to ~2/|nations| before
    * anything shuffles), the surviving lineitems then shuffle-join
    * orders on the order key (the one unavoidable fact-fact exchange),
    * and customer — gated, it grows with SF — resolves the buying
    * nation last, with the cross-pair disjunction applied as a residual
    * filter. Year extraction and the pair predicate are codegen'd; the
    * rollup shuffles |pairs|×|years| rows. */
  val t78 = GQuery(
    "t78_volume_shipping",
    (s, dir) => {
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val suppNations = t(s, dir, "supplier")
        .join(t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2")),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      val custNations = t(s, dir, "customer")
        .join(t(s, dir, "nation").filter(col("n_name").isin("NATION_1", "NATION_2")),
          col("c_nationkey") === col("n_nationkey"))
        .select(col("c_custkey"), col("n_name").as("cust_nation"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .join(graft.operators.JoinHints.broadcastIfSmall(suppNations),
          col("l_suppkey") === col("s_suppkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_custkey")),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(custNations),
          col("o_custkey") === col("c_custkey"))
        .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
          (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"),
          year(col("l_shipdate")).as("l_year"))
        .agg(round(sum(volume), 2).as("revenue"))
        .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
    },
    Some("""SELECT supp_nation, cust_nation, l_year, round(sum(volume), 2) AS revenue
      FROM (SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
              year(l_shipdate) AS l_year,
              l_extendedprice * (1 - l_discount) AS volume
            FROM supplier
            JOIN lineitem ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            JOIN nation n1 ON s_nationkey = n1.n_nationkey
            JOIN nation n2 ON c_nationkey = n2.n_nationkey
            WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
                OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01') shipping
      GROUP BY supp_nation, cust_nation, l_year
      ORDER BY supp_nation, cust_nation, l_year"""))

  /** T79 NATIONAL MARKET SHARE (the TPC-H Q8 shape): one nation's share
    * of a part type's volume sold into a region, by year. The
    * conditional-fraction aggregate (`sum(case)/sum`) rides ONE rollup;
    * join order mirrors selectivity — the type-filtered part (1/|types|)
    * broadcasts onto the fact first, then orders (date-pruned,
    * fact-fact shuffle), then the gated customer limited to the region's
    * nations, then the 1-row-per-supplier nation tag. The share divides
    * two same-group sums, so cross-engine FP agrees to ~1e-15
    * relatively; rounded at 6 dp. */
  val t79 = GQuery(
    "t79_market_share",
    (s, dir) => {
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      val regionCust = t(s, dir, "customer")
        .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "region").filter(col("r_name") === "ASIA"),
          col("n_regionkey") === col("r_regionkey"))
        .select(col("c_custkey"))
      val suppNation = t(s, dir, "supplier")
        .join(t(s, dir, "nation"), col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("n_name").as("supp_nation"))
      t(s, dir, "lineitem")
        .join(graft.operators.JoinHints.broadcastIfSmall(
            t(s, dir, "part").filter(col("p_type") === "ECONOMY")
              .select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders")
            .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
              col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
            .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(regionCust),
          col("o_custkey") === col("c_custkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(suppNation),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(round(
          sum(when(col("supp_nation") === "NATION_3", volume).otherwise(0.0)) /
            sum(volume), 6).as("mkt_share"))
        .orderBy(col("o_year"))
    },
    Some("""SELECT o_year,
        round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume ELSE 0 END)
          / sum(volume), 6) AS mkt_share
      FROM (SELECT year(o_orderdate) AS o_year,
              l_extendedprice * (1 - l_discount) AS volume,
              n2.n_name AS supp_nation
            FROM part
            JOIN lineitem ON p_partkey = l_partkey
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation n1 ON c_nationkey = n1.n_nationkey
            JOIN region ON n1.n_regionkey = r_regionkey
            JOIN nation n2 ON s_nationkey = n2.n_nationkey
            WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1998-01-01') all_nations
      GROUP BY o_year ORDER BY o_year"""))

  /** T80 CUSTOMER ORDER DISTRIBUTION (the TPC-H Q13 shape): how many
    * customers placed exactly k qualifying orders, including k=0 — the
    * left-outer + double-aggregation shape. Orders pre-aggregate to one
    * row per customer BEFORE the outer join (the join carries |customers|
    * rows, never |orders|), nulls from the outer side coalesce to 0, and
    * the second rollup shuffles one row per distinct count. At 100 TB
    * both aggregations combine map-side; nothing holds per-order state
    * past the first partial. */
  val t80 = GQuery(
    "t80_cust_order_dist",
    (s, dir) => {
      val perCust = t(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "1-URGENT")
        .groupBy(col("o_custkey")).agg(count(lit(1)).as("c_count"))
      t(s, dir, "customer").select(col("c_custkey"))
        .join(perCust, col("c_custkey") === col("o_custkey"), "left")
        .select(coalesce(col("c_count"), lit(0L)).as("c_count"))
        .groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some("""SELECT c_count, count(*) AS custdist
      FROM (SELECT c_custkey, count(o_orderkey) AS c_count
            FROM customer
            LEFT JOIN orders ON c_custkey = o_custkey
              AND o_orderpriority <> '1-URGENT'
            GROUP BY c_custkey) c_orders
      GROUP BY c_count ORDER BY custdist DESC, c_count DESC"""))

  /** T81 PROMO REVENUE SHARE (the TPC-H Q14 shape): percent of one
    * month's revenue from promo-type parts. Part carries only the join
    * key and the type tag, and grows with SF, so its broadcast is gated;
    * the month filter prunes the fact at the scan; the conditional
    * percentage is two sums in ONE map-side-combined global aggregate —
    * 1 row out. Rounded at 6 dp (the division's cross-engine agreement
    * is relative ~1e-15, far inside 6 dp). */
  val t81 = GQuery(
    "t81_promo_revenue",
    (s, dir) => {
      val volume = col("l_extendedprice") * (lit(1) - col("l_discount"))
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1997-03-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
        .join(graft.operators.JoinHints.broadcastIfSmall(
            t(s, dir, "part").select(col("p_partkey"), col("p_type"))),
          col("l_partkey") === col("p_partkey"))
        .agg(round(lit(100.0) *
          sum(when(col("p_type") === "PROMO", volume).otherwise(0.0)) /
          sum(volume), 6).as("promo_revenue"))
    },
    Some("""SELECT round(100.0 *
        sum(CASE WHEN p_type = 'PROMO'
            THEN l_extendedprice * (1 - l_discount) ELSE 0 END)
        / sum(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE l_shipdate >= TIMESTAMP '1997-03-01'
        AND l_shipdate < TIMESTAMP '1997-04-01'"""))

  /** T82 DISJUNCTIVE-PREDICATE JOIN (the TPC-H Q19 shape): revenue from
    * three OR'd (brand, size-band, quantity-band) clause groups — the
    * classic test that an OR of conjunctions still JOINS ON THE KEY:
    * Catalyst keeps `l_partkey = p_partkey` as the equi-condition (hash
    * join, never a nested loop) and evaluates the disjunction as a
    * post-join residual; the part-only disjuncts (brand ∨ brand ∨ brand)
    * additionally prune the build side. Quantity bands are integer-
    * valued; revenue rounds at 2 dp. */
  val t82 = GQuery(
    "t82_disjunctive_join",
    (s, dir) => {
      val q = col("l_quantity"); val sz = col("p_size"); val b = col("p_brand")
      val clauses =
        (b === "Brand#12" && sz.between(1, 5) && q.between(1, 11)) ||
        (b === "Brand#23" && sz.between(1, 10) && q.between(10, 20)) ||
        (b === "Brand#34" && sz.between(1, 15) && q.between(20, 30))
      t(s, dir, "lineitem")
        .join(graft.operators.JoinHints.broadcastIfSmall(
            t(s, dir, "part").filter(b.isin("Brand#12", "Brand#23", "Brand#34"))
              .select(col("p_partkey"), col("p_brand"), col("p_size"))),
          col("l_partkey") === col("p_partkey") && clauses)
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
    },
    Some("""SELECT round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5
             AND l_quantity BETWEEN 1 AND 11)
         OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 10
             AND l_quantity BETWEEN 10 AND 20)
         OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 15
             AND l_quantity BETWEEN 20 AND 30)"""))

  /** T84 PIVOT (O9): long→wide reshaping — revenue by return flag
    * pivoted into one column per line status. The VALUES ARE DECLARED
    * (`pivot(col, Seq(...))`), the scale-relevant form: Spark otherwise
    * runs an extra distinct-values job and caps at
    * `spark.sql.pivotMaxValues`; with declared values the plan is ONE
    * map-side-combined aggregate whose output width is fixed at compile
    * time — exactly the manual sum(CASE…) expansion the oracle spells,
    * no second pass, no shuffle beyond the rollup's. */
  val t84 = GQuery(
    "t84_pivot",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        round(sum(CASE WHEN l_linestatus = 'F'
          THEN l_extendedprice * (1 - l_discount) END), 2) AS F,
        round(sum(CASE WHEN l_linestatus = 'O'
          THEN l_extendedprice * (1 - l_discount) END), 2) AS O
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** T85 UNPIVOT (O10): wide→long reshaping — part's numeric attributes
    * melted into (attribute, value) rows. `unpivot` is a zero-shuffle
    * per-row expansion (each input row emits one row per value column,
    * inside the scan stage's codegen — the Expand operator), so at
    * 100 TB it costs exactly the width multiplier, never an exchange;
    * the rollup after it is the only shuffle. */
  val t85 = GQuery(
    "t85_unpivot",
    (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"), col("p_retailprice"),
          col("p_size").cast("double").as("p_size"))
        .unpivot(Array(col("p_partkey")), Array(col("p_retailprice"), col("p_size")),
          "attribute", "value")
        .groupBy(col("attribute"))
        .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("total"),
          round(max(col("value")), 2).as("max_v"))
        .orderBy(col("attribute")),
    Some("""SELECT attribute, count(*) AS cnt, round(sum(value), 2) AS total,
        round(max(value), 2) AS max_v
      FROM (SELECT 'p_retailprice' AS attribute, p_retailprice AS value FROM part
            UNION ALL
            SELECT 'p_size', CAST(p_size AS DOUBLE) FROM part) u
      GROUP BY attribute ORDER BY attribute"""))

  /** T95 MINIMUM-COST SUPPLIER (the TPC-H Q2 shape, adapted — no
    * partsupp table, so a part's "cost quotes" are its lineitems and the
    * quote is the raw `l_extendedprice` column): for each SMALL-type part
    * under size 10, the supplier(s) whose line attains the part's MINIMUM
    * price. Plan for 100 TB: the aggregate-then-join-back idiom — the
    * per-part min is a tiny (partkey, min) frame that broadcasts back
    * onto the part-filtered fact, so the fact shuffles ONCE for the agg
    * and never for the match; the join-back equality compares the RAW
    * stored column (no float arithmetic → bit-identical across engines).
    * Supplier and part dims broadcast. */
  val t95 = GQuery(
    "t95_min_cost_supplier",
    (s, dir) => {
      val parts = t(s, dir, "part")
        .filter(col("p_type") === "SMALL" && col("p_size") < 10)
        .select(col("p_partkey"), col("p_name"))
      val quotes = t(s, dir, "lineitem")
        .join(graft.operators.JoinHints.broadcastIfSmall(parts),
          col("l_partkey") === col("p_partkey"))
        .select(col("p_partkey"), col("p_name"), col("l_suppkey"),
          col("l_extendedprice"))
      val mins = quotes.groupBy(col("p_partkey").as("m_partkey"))
        .agg(min(col("l_extendedprice")).as("min_price"))
      quotes.join(graft.operators.JoinHints.broadcastIfSmall(mins),
          col("p_partkey") === col("m_partkey") &&
            col("l_extendedprice") === col("min_price"))
        .join(graft.operators.JoinHints.broadcastIfSmall(
          t(s, dir, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .select(col("p_partkey"), col("p_name"), col("s_name"),
          round(col("min_price"), 2).as("min_price"))
        .orderBy(col("p_partkey"), col("s_name"))
        .limit(100)
    },
    Some("""WITH quotes AS (
        SELECT p_partkey, p_name, l_suppkey, l_extendedprice
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE p_type = 'SMALL' AND p_size < 10),
      mins AS (SELECT p_partkey AS m_partkey, min(l_extendedprice) AS min_price
               FROM quotes GROUP BY 1)
      SELECT p_partkey, p_name, s_name, round(min_price, 2) AS min_price
      FROM quotes
      JOIN mins ON p_partkey = m_partkey AND l_extendedprice = min_price
      JOIN supplier ON l_suppkey = s_suppkey
      ORDER BY p_partkey, s_name LIMIT 100"""))

  /** T96 PRODUCT-TYPE PROFIT (the TPC-H Q9 shape, adapted — supply cost
    * proxied by a deterministic per-line formula over p_retailprice since
    * partsupp does not exist): profit by nation and order year over parts
    * whose name starts with 'small'. Plan for 100 TB: lineitem is the
    * only fact — part (name-filtered), supplier, nation broadcast;
    * orders joins on the fact's orderkey (the one shuffle pair);
    * aggregation is partial-then-final on (nation, year). The amount is
    * computed in EXACT integer 10⁻⁴-dollar units (2-dp money × integer
    * percent × integer quantity) — double summation order flipped a
    * cent at this group count, and exact integers cannot. */
  val t96 = GQuery(
    "t96_product_profit",
    (s, dir) => {
      val amount = round(col("l_extendedprice") * 100).cast("long") *
        (lit(100L) - round(col("l_discount") * 100).cast("long")) -
        round(col("p_retailprice") * 100).cast("long") *
          col("l_quantity").cast("long") * lit(10L)
      t(s, dir, "lineitem")
        .join(graft.operators.JoinHints.broadcastIfSmall(
          t(s, dir, "part").filter(col("p_name").startsWith("small"))
            .select(col("p_partkey"), col("p_retailprice"))),
          col("l_partkey") === col("p_partkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(
          t(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(
          t(s, dir, "nation").select(col("n_nationkey"), col("n_name"))),
          col("s_nationkey") === col("n_nationkey"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("n_name").as("nation"),
          year(col("o_orderdate")).as("o_year"))
        .agg(round(sum(amount) / 10000.0, 2).as("profit"))
        .orderBy(col("nation"), col("o_year").desc)
    },
    Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
        round(CAST(sum(
          CAST(round(l_extendedprice * 100) AS BIGINT)
            * (100 - CAST(round(l_discount * 100) AS BIGINT))
          - CAST(round(p_retailprice * 100) AS BIGINT)
            * CAST(l_quantity AS BIGINT) * 10) AS BIGINT) / 10000.0, 2) AS profit
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      JOIN supplier ON l_suppkey = s_suppkey
      JOIN nation ON s_nationkey = n_nationkey
      JOIN orders ON l_orderkey = o_orderkey
      WHERE p_name LIKE 'small%'
      GROUP BY 1, 2 ORDER BY nation, o_year DESC"""))

  /** T97 IMPORTANT STOCK (the TPC-H Q11 shape, adapted — a part's "stock
    * held by a nation" is the total quantity its suppliers shipped):
    * parts whose quantity from NATION_3's suppliers exceeds a FRACTION of
    * that nation's grand total — the grouped-agg-vs-global-scalar HAVING.
    * Plan for 100 TB: ONE shuffle groups the nation-filtered fact by
    * partkey; the global total re-aggregates the per-part partials (never
    * a second fact scan) and broadcasts as a one-row cross join into the
    * filter. Quantities are small integers in doubles — the sums are
    * EXACT in both engines, so the threshold cut cannot flip on
    * summation order. */
  val t97 = GQuery(
    "t97_important_stock",
    (s, dir) => {
      val slice = t(s, dir, "lineitem")
        .join(graft.operators.JoinHints.broadcastIfSmall(
          t(s, dir, "supplier").join(
            t(s, dir, "nation").filter(col("n_name") === "NATION_3"),
            col("s_nationkey") === col("n_nationkey"))
            .select(col("s_suppkey"))),
          col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .localCheckpoint(false) // per-part rollup feeds BOTH the total and the cut
      val total = slice.agg(sum(col("qty")).as("total_qty"))
      slice.crossJoin(broadcast(total))
        .filter(col("qty") > col("total_qty") * lit(0.0002))
        .select(col("l_partkey"), round(col("qty"), 2).as("qty"))
        .orderBy(col("qty").desc, col("l_partkey"))
        .limit(100)
    },
    Some("""WITH slice AS (
        SELECT l_partkey, sum(l_quantity) AS qty
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_3'
        GROUP BY 1)
      SELECT l_partkey, round(qty, 2) AS qty FROM slice
      WHERE qty > (SELECT sum(qty) FROM slice) * 0.0002
      ORDER BY qty DESC, l_partkey LIMIT 100"""))

  /** T98 SHIPPING PRIORITY SPLIT (the TPC-H Q12 shape, adapted —
    * l_returnflag stands in for the missing l_shipmode): per flag, how
    * many 1996-shipped lines belong to URGENT/HIGH orders vs the rest —
    * the conditional-count (CASE-sum) aggregation. Plan for 100 TB: the
    * date filter pushes to the fact scan; orders projects two columns
    * into the join; counts are exact integers. */
  val t98 = GQuery(
    "t98_priority_split",
    (s, dir) => {
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_returnflag"))
        .join(t(s, dir, "orders").select(col("o_orderkey"), col("o_orderpriority")),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(high, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
          THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate < TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** T99 SUPPLIER COUNT BY PART SLICE (the TPC-H Q16 shape, adapted —
    * the part⇄supplier relation is "shipped at least one line"): DISTINCT
    * suppliers per (brand, type, size) over a brand/type/size slice,
    * excluding a name-pattern supplier blacklist via NOT IN. Plan for
    * 100 TB: the blacklist subquery is a tiny broadcast anti-join (never
    * a driver collect); the distinct-count shuffles once on the group
    * keys with the suppkey carried; counts are exact. */
  val t99 = GQuery(
    "t99_supplier_count",
    (s, dir) => {
      val bad = t(s, dir, "supplier")
        .filter(col("s_name").endsWith("7")).select(col("s_suppkey"))
      t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(graft.operators.JoinHints.broadcastIfSmall(bad),
          col("l_suppkey") === col("s_suppkey"), "left_anti")
        .join(graft.operators.JoinHints.broadcastIfSmall(
          t(s, dir, "part").filter(col("p_brand") =!= "Brand#1" &&
            !col("p_type").startsWith("PROMO") && col("p_size") <= 15)
            .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
        .limit(100)
    },
    Some("""SELECT p_brand, p_type, p_size,
        count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem
      JOIN part ON l_partkey = p_partkey
      WHERE p_brand <> 'Brand#1' AND p_type NOT LIKE 'PROMO%' AND p_size <= 15
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_name LIKE '%7')
      GROUP BY 1, 2, 3
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size LIMIT 100"""))

  /** T100 EXCESS SHIPPERS (the TPC-H Q20 shape, adapted): suppliers who
    * shipped MORE than a quantity threshold of 'red'-named parts in 1996
    * — the nested-IN idiom (supplier IN ⟨grouped HAVING subquery over a
    * part-filtered fact⟩). Plan for 100 TB: the inner subquery reduces
    * the fact to a per-supplier quantity rollup over the name-filtered
    * parts (broadcast dim), the HAVING keeps a small key set, and the
    * outer supplier table semi-joins against it — quantities are exact
    * integer sums, so the threshold cut is engine-stable. */
  val t100 = GQuery(
    "t100_excess_shippers",
    (s, dir) => {
      val redParts = t(s, dir, "part")
        .filter(col("p_name").startsWith("red")).select(col("p_partkey"))
      val heavy = t(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .join(graft.operators.JoinHints.broadcastIfSmall(redParts),
          col("l_partkey") === col("p_partkey"))
        .groupBy(col("l_suppkey"))
        .agg(sum(col("l_quantity")).as("qty"))
        .filter(col("qty") > 50)
      t(s, dir, "supplier")
        .join(graft.operators.JoinHints.broadcastIfSmall(heavy),
          col("s_suppkey") === col("l_suppkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    },
    Some("""SELECT s_suppkey, s_name FROM supplier
      WHERE s_suppkey IN (
        SELECT l_suppkey FROM lineitem
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE 'red%'
          AND l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY l_suppkey HAVING sum(l_quantity) > 50)
      ORDER BY s_suppkey"""))

  def all: Seq[GQuery] = Seq(t4, t5, t6, t7, t8, t9, t9b, t10, t10b, t11, t12, t13, t14,
    t15, t16, t17, t18, t19, t19b, t20, t21, t22, t23, t24, t25, t30, t31,
    t32, t33, t34, t35, t36, t37, t38, t39, t63, t64, t65, t66, t67, t68,
    t69, t70, t74, t75, t76, t77, t78, t79, t80, t81, t82, t84, t85,
    t95, t96, t97, t98, t99, t100)
}
