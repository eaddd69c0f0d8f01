package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables
import graft.functions.VectorExpressions

/** SURVEY.md §7.1: the headline queries as Spark SQL TEXT — the second query
  * surface. Each must produce exactly the rows of its DataFrame twin in
  * [[BenchQueries]] (asserted in SqlParitySpec). Dialect differences from
  * the DuckDB oracles: unix_micros/epoch_us, split/string_split, and the
  * engine's own `vec_dot` (registered via GraftExtensions / register()).
  */
object SqlQueries {

  def run(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    Tables.registerAll(spark, sfDir)
    VectorExpressions.register(spark)
    spark.sql(sql(name))
  }

  def sql(name: String): String = texts(name)

  val texts: Map[String, String] = Map(
    "t54_corr_stats" -> """SELECT l_returnflag,
        round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        round(covar_pop(l_extendedprice, l_quantity), 2) AS covar_pq,
        round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
        count(1) AS cnt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "l34_bm25_topk" -> """WITH pt AS (SELECT doc_id,
        CAST(size(split(text, ' ')) AS DOUBLE) AS dl,
        CAST(size(filter(split(text, ' '), x -> x = 'vector')) AS DOUBLE) AS tf_0,
        CAST(size(filter(split(text, ' '), x -> x = 'window')) AS DOUBLE) AS tf_1,
        CAST(size(filter(split(text, ' '), x -> x = 'hash')) AS DOUBLE) AS tf_2
      FROM documents),
      st AS (SELECT CAST(count(1) AS DOUBLE) AS n, sum(dl) AS sumdl,
        sum(CASE WHEN tf_0 > 0 THEN 1.0D ELSE 0.0D END) AS df_0,
        sum(CASE WHEN tf_1 > 0 THEN 1.0D ELSE 0.0D END) AS df_1,
        sum(CASE WHEN tf_2 > 0 THEN 1.0D ELSE 0.0D END) AS df_2
      FROM pt),
      sc AS (SELECT doc_id,
        ln(1.0D + (n - df_0 + 0.5D) / (df_0 + 0.5D)) * (tf_0 * (1.2D + 1.0D)) / (tf_0 + 1.2D * (1.0D - 0.75D + 0.75D * dl / (sumdl / n))) +
        ln(1.0D + (n - df_1 + 0.5D) / (df_1 + 0.5D)) * (tf_1 * (1.2D + 1.0D)) / (tf_1 + 1.2D * (1.0D - 0.75D + 0.75D * dl / (sumdl / n))) +
        ln(1.0D + (n - df_2 + 0.5D) / (df_2 + 0.5D)) * (tf_2 * (1.2D + 1.0D)) / (tf_2 + 1.2D * (1.0D - 0.75D + 0.75D * dl / (sumdl / n))) AS score
      FROM pt CROSS JOIN st),
      scf AS (SELECT doc_id, score FROM sc WHERE score > 0D),
      rk AS (SELECT doc_id, row_number() OVER (ORDER BY score DESC, doc_id) AS rank, score FROM scf)
      SELECT doc_id, rank, round(score, 6) AS score FROM rk WHERE rank <= 20 ORDER BY rank""",
    "l36_weighted_sampling" -> """WITH b AS (SELECT lang, n_chars,
        pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT), 10000) AS bucket,
        floor(least(greatest(n_chars / 2000.0D, 0.0D), 1.0D) * 10000) AS thr
      FROM documents)
      SELECT lang, count(1) AS sampled, sum(n_chars) AS sum_chars
      FROM b WHERE bucket < thr GROUP BY lang ORDER BY lang""",
    "l37_corpus_shuffle" -> """WITH h AS (SELECT doc_id,
        md5(concat('ep42-', CAST(doc_id AS STRING))) AS shuffle_key FROM documents),
      r AS (SELECT doc_id, shuffle_key,
        row_number() OVER (ORDER BY shuffle_key, doc_id) AS pos FROM h)
      SELECT pos, doc_id, shuffle_key FROM r WHERE pos <= 25 ORDER BY pos""",
    "t57_twap" -> """WITH s AS (SELECT user_id, value,
        unix_micros(ts) AS tsu,
        lead(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxtu
      FROM events WHERE user_id < 40)
      SELECT user_id, round(sum(value * (nxtu - tsu)) / sum(nxtu - tsu), 6) AS twap,
        count(1) AS n_intervals
      FROM s WHERE nxtu IS NOT NULL GROUP BY user_id ORDER BY user_id""",
    "t58_ohlc" -> """SELECT user_id, to_date(date_trunc('day', ts)) AS day,
        min_by(value, format_string('%020d-%010d', unix_micros(ts), event_id)) AS open,
        max(value) AS high, min(value) AS low,
        max_by(value, format_string('%020d-%010d', unix_micros(ts), event_id)) AS close,
        count(1) AS n
      FROM events WHERE user_id < 8
      GROUP BY user_id, to_date(date_trunc('day', ts))
      ORDER BY user_id, day""",
    "t52_rank_stats" -> """SELECT user_id, event_id,
        ntile(4) OVER w AS quartile,
        CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micro,
        CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micro
      FROM events WHERE event_type = 'purchase' AND user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY user_id, event_id""",
    "t53_string_agg" -> """SELECT user_id,
        concat_ws(',', array_sort(collect_set(event_type))) AS types,
        count(1) AS cnt
      FROM events WHERE user_id < 12 GROUP BY user_id ORDER BY user_id""",
    "l32_chunk_dedup" -> """WITH c AS (
        SELECT doc_id, chunk_text
        FROM documents
        LATERAL VIEW posexplode(transform(
          sequence(0, greatest(CAST(ceil((size(split(text, ' ')) - 32) / 24.0) AS INT), 0)),
          i -> concat_ws(' ', slice(split(text, ' '), i * 24 + 1, 32)))) v AS chunk_idx, chunk_text)
      SELECT md5(chunk_text) AS chunk_md5,
        count(DISTINCT doc_id) AS n_docs, count(1) AS n_occurrences
      FROM c GROUP BY md5(chunk_text) HAVING count(DISTINCT doc_id) > 1
      ORDER BY chunk_md5""",
    "l31_chunking" -> """SELECT doc_id, chunk_idx,
        size(split(chunk_text, ' ')) AS n_toks, md5(chunk_text) AS chunk_md5
      FROM documents
      LATERAL VIEW posexplode(transform(
        sequence(0, greatest(CAST(ceil((size(split(text, ' ')) - 32) / 24.0) AS INT), 0)),
        i -> concat_ws(' ', slice(split(text, ' '), i * 24 + 1, 32)))) c AS chunk_idx, chunk_text
      ORDER BY doc_id, chunk_idx""",
    "t51_drift" -> """WITH b AS (SELECT CAST(least(greatest(floor(value / 50.0), 0), 9) AS INT) AS bucket,
          (ts < TIMESTAMP '2024-01-15 00:00:00') AS is_ref FROM events),
      c AS (SELECT bucket,
          sum(CASE WHEN is_ref THEN 1L ELSE 0L END) AS cnt_ref,
          sum(CASE WHEN NOT is_ref THEN 1L ELSE 0L END) AS cnt_cur
        FROM b GROUP BY bucket),
      f AS (SELECT bucket, cnt_ref, cnt_cur,
          greatest(CAST(cnt_ref AS DOUBLE) / CAST(sum(cnt_ref) OVER () AS DOUBLE), 1e-6) AS p_ref,
          greatest(CAST(cnt_cur AS DOUBLE) / CAST(sum(cnt_cur) OVER () AS DOUBLE), 1e-6) AS p_cur
        FROM c)
      SELECT bucket, cnt_ref, cnt_cur,
        CAST(round((p_ref - p_cur) * ln(p_ref / p_cur) * 1000000.0) AS BIGINT) AS psi_micro
      FROM f ORDER BY bucket""",
    "b1_pricing" -> """SELECT l_returnflag, l_linestatus,
      round(sum(l_quantity), 2) AS sum_qty,
      round(sum(l_extendedprice), 2) AS sum_base_price,
      round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      round(avg(l_quantity), 2) AS avg_qty,
      round(avg(l_extendedprice), 2) AS avg_price,
      round(avg(l_discount), 4) AS avg_disc,
      count(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",

    "b2_join_revenue" -> """SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM region JOIN nation ON n_regionkey = r_regionkey
      JOIN customer ON c_nationkey = n_nationkey
      JOIN orders ON o_custkey = c_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE r_name = 'ASIA' AND o_orderdate >= TIMESTAMP '1996-01-01'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",

    "b3_topk_window" -> """SELECT c_mktsegment, rn, c_custkey, c_name, c_acctbal FROM (
      SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer) WHERE rn <= 3 ORDER BY c_mktsegment, rn""",

    "b4_running_sum" -> """SELECT o_custkey, o_orderkey, o_orderdate,
      round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_total
      FROM orders ORDER BY o_custkey, o_orderdate, o_orderkey LIMIT 100""",

    "b5_rollup" -> """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt,
      round(sum(o_totalprice), 2) AS total
      FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""",

    "b6_distinct" -> "SELECT count(DISTINCT user_id) AS exact_users FROM events",

    "b7_semi_anti" -> """SELECT
      (SELECT count(*) FROM customer c WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS with_orders,
      (SELECT count(*) FROM customer c WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)) AS without_orders""",

    "b8_json" -> """SELECT event_type,
      sum(CAST(get_json_object(props, '$.k') AS BIGINT)) AS sum_k,
      count(*) AS cnt
      FROM events GROUP BY event_type ORDER BY event_type""",

    "b9_sessionize" -> """SELECT count(*) AS sessions FROM (
      SELECT unix_micros(ts) AS us,
             lag(unix_micros(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events) WHERE prev_us IS NULL OR us - prev_us > 1800000000""",

    "b10_tumbling" -> """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS cnt,
      round(sum(value), 2) AS sum_value
      FROM events GROUP BY 1, 2 ORDER BY hour, event_type LIMIT 100""",

    "b11_tokens" -> """SELECT lang, count(*) AS docs,
      sum(size(split(text, ' '))) AS tokens
      FROM documents GROUP BY lang ORDER BY lang""",

    "b12_cosine_topk" -> """WITH e AS (
        SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings),
      n AS (SELECT vec_id, v, sqrt(vec_dot(v, v)) AS nrm FROM e),
      pairs AS (SELECT a.vec_id AS a_id, b.vec_id AS b_id,
          vec_dot(a.v, b.v) / (a.nrm * b.nrm) AS sim
        FROM n a JOIN n b ON a.vec_id <> b.vec_id),
      ranked AS (SELECT a_id, b_id, sim,
          row_number() OVER (PARTITION BY a_id ORDER BY sim DESC, b_id) AS rn FROM pairs)
      SELECT a_id AS vec_id, b_id AS nn_id, round(sim, 4) AS cosine
      FROM ranked WHERE rn = 1 ORDER BY vec_id LIMIT 20""",

    "b13_asof" -> """WITH tagged AS (
        SELECT user_id, ts, event_id, value,
               CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS side
        FROM events WHERE event_type IN ('purchase', 'signup')),
      matched AS (
        SELECT side, value, ts,
               last(CASE WHEN side = 0 THEN ts END, true)
                 OVER (PARTITION BY user_id ORDER BY ts, side, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS signup_ts
        FROM tagged)
      SELECT count(*) AS matched, round(sum(value), 2) AS total_value,
             round(sum((unix_micros(ts) - unix_micros(signup_ts)) / 1000000.0D), 2) AS total_lag_s
      FROM matched WHERE side = 1 AND signup_ts IS NOT NULL""",

    "b14_intersect" -> """SELECT count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t""",

    "b15_dedup_hash" ->
      "SELECT count(*) AS total_docs, count(DISTINCT md5(text)) AS distinct_docs FROM documents",

    // ---- T-suite as SQL text (Spark dialect) ----
    "t4_predicates" -> """SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders
      WHERE o_orderpriority IN ('1-URGENT','2-HIGH') AND o_totalprice BETWEEN 1000 AND 50000
        AND o_orderstatus <> 'P' ORDER BY o_orderkey LIMIT 50""",
    "t5_case_bands" -> """SELECT CASE WHEN c_acctbal < 0 THEN 'neg' WHEN c_acctbal < 2500 THEN 'low'
        WHEN c_acctbal < 5000 THEN 'mid' WHEN c_acctbal < 7500 THEN 'high' ELSE 'top' END AS band,
      count(*) AS cnt, round(sum(c_acctbal), 2) AS total_bal
      FROM customer GROUP BY 1 ORDER BY band""",
    "t6_outer_join" -> """SELECT
      (SELECT count(*) FROM customer LEFT JOIN orders ON o_custkey = c_custkey WHERE o_orderkey IS NULL) AS left_join_no_orders,
      (SELECT count(*) FROM orders RIGHT JOIN customer ON o_custkey = c_custkey WHERE o_orderkey IS NULL) AS right_join_no_orders""",
    "t7_full_outer" -> """SELECT
      CAST(sum(CASE WHEN ck IS NOT NULL AND ok IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS matched,
      CAST(sum(CASE WHEN ok IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS customer_only,
      CAST(sum(CASE WHEN ck IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS order_only
      FROM (SELECT DISTINCT c_custkey AS ck FROM customer) c
      FULL JOIN (SELECT DISTINCT o_custkey AS ok FROM orders) o ON ck = ok""",
    "t8_theta_join" -> """SELECT count(*) AS pairs FROM lineitem JOIN part
      ON l_partkey = p_partkey AND l_quantity > p_size""",
    "t10_interval_join" -> """SELECT count(*) AS pairs FROM
      (SELECT user_id, unix_micros(ts) AS us1 FROM events) e1
      JOIN (SELECT user_id, unix_micros(ts) AS us2 FROM events) e2
      ON e1.user_id = e2.user_id AND us2 > us1 AND us2 <= us1 + 300000000""",
    "t11_cube" -> """SELECT l_returnflag, l_linestatus, count(*) AS cnt, round(sum(l_quantity), 2) AS sum_qty
      FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
      ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""",
    "t13_having" -> """SELECT c_mktsegment, count(*) AS cnt FROM customer
      GROUP BY c_mktsegment HAVING count(*) > 100 ORDER BY c_mktsegment""",
    "t14_distinct" -> """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus""",
    "t15_max_by" -> """SELECT c_mktsegment,
      max_by(c_name, struct(c_acctbal, -c_custkey)) AS top_name,
      round(max(c_acctbal), 2) AS top_bal
      FROM customer GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "t16_percentiles" -> """SELECT o_orderstatus, round(percentile(o_totalprice, 0.5), 2) AS median_price,
      round(percentile(o_totalprice, 0.9), 2) AS p90_price
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "t17_collect_set" -> """SELECT user_id, concat_ws(',', array_sort(collect_set(event_type))) AS types
      FROM events GROUP BY user_id ORDER BY user_id LIMIT 50""",
    "t18_rank" -> """SELECT p_brand, p_partkey, p_retailprice,
      rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS rnk,
      dense_rank() OVER (PARTITION BY p_brand ORDER BY p_retailprice DESC) AS drnk
      FROM part ORDER BY p_brand, rnk, p_partkey LIMIT 100""",
    "t20_first_last" -> """SELECT DISTINCT user_id,
      first_value(event_type) OVER w AS first_type,
      last_value(event_type) OVER w AS last_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id LIMIT 100""",
    "t22_range_frame" -> """SELECT user_id, event_id,
      count(*) OVER (PARTITION BY user_id ORDER BY unix_micros(ts)
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS events_last_hour
      FROM events ORDER BY user_id, event_id LIMIT 200""",
    "t23_offset" -> """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 50 OFFSET 100""",
    "t24_union" -> """SELECT
      (SELECT count(*) FROM (SELECT o_orderkey FROM orders WHERE o_totalprice < 150000
        UNION ALL SELECT o_orderkey FROM orders WHERE o_totalprice > 50000) t) AS union_all_cnt,
      (SELECT count(*) FROM (SELECT o_orderkey FROM orders WHERE o_totalprice < 150000
        UNION SELECT o_orderkey FROM orders WHERE o_totalprice > 50000) t) AS union_distinct_cnt""",
    "t25_except" -> """SELECT count(*) AS n FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'F') t""",
    "t9_broadcast_join" -> """SELECT /*+ BROADCAST(region), BROADCAST(nation), BROADCAST(customer) */
      n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem
      JOIN orders ON l_orderkey = o_orderkey AND o_orderdate >= TIMESTAMP '1996-01-01'
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
      GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "t12_grouping_sets" -> """SELECT o_orderstatus, o_orderpriority,
      CAST(grouping_id() AS BIGINT) AS gid, count(*) AS cnt
      FROM orders GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
      ORDER BY gid, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "t19_ntile" -> """SELECT c_mktsegment, quartile, count(*) AS cnt,
      round(min(c_acctbal), 2) AS min_bal, round(max(c_acctbal), 2) AS max_bal,
      round(max(pr), 4) AS max_pr
      FROM (SELECT c_mktsegment, c_acctbal,
              ntile(4) OVER w AS quartile, round(percent_rank() OVER w, 4) AS pr
            FROM customer WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey))
      GROUP BY c_mktsegment, quartile ORDER BY c_mktsegment, quartile""",
    "t21_moving_avg" -> """SELECT day, day_total,
      round(avg(day_total) OVER (ORDER BY day ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS ma3
      FROM (SELECT date_trunc('day', o_orderdate) AS day, round(sum(o_totalprice), 2) AS day_total
            FROM orders GROUP BY 1)
      ORDER BY day LIMIT 200""",
    "t26_strings" -> """SELECT p_partkey,
      split(p_name, ' ')[0] AS first_token,
      upper(p_name) AS upper_name,
      length(p_name) AS name_len,
      regexp_extract(p_name, '(\\w+)$', 1) AS last_word,
      lpad(p_brand, 12, '#') AS padded_brand,
      replace(p_type, ' ', '_') AS type_snake,
      instr(p_type, 'a') AS a_pos,
      concat_ws('-', p_brand, p_type) AS brand_type,
      substring(p_name, 1, 5) AS name5,
      startswith(p_name, 'a') AS starts_a,
      endswith(p_name, 'e') AS ends_e
      FROM part ORDER BY p_partkey LIMIT 200""",
    "t27_dates" -> """SELECT year(o_orderdate) AS yr, quarter(o_orderdate) AS qtr,
      count(*) AS cnt,
      count(DISTINCT month(o_orderdate)) AS n_months,
      min(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')) AS min_days,
      max(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01')) AS max_days,
      min(unix_timestamp(o_orderdate)) AS min_epoch,
      min(date_add(CAST(o_orderdate AS DATE), 30)) AS min_plus30
      FROM orders GROUP BY 1, 2 ORDER BY yr, qtr""",
    "t28_math" -> """SELECT l_orderkey, l_linenumber,
      round(sqrt(l_extendedprice), 4) AS sqrt_price,
      round(pow(1 + l_discount, 3), 6) AS pow_disc,
      round(ln(l_extendedprice), 6) AS ln_price,
      round(exp(l_discount), 6) AS exp_disc,
      abs(l_quantity - 25) AS abs_qty,
      ceil(l_extendedprice / 1000) AS ceil_k,
      floor(l_extendedprice / 1000) AS floor_k,
      signum(l_quantity - 25.0D) AS sgn,
      greatest(l_quantity, l_discount * 100) AS gr,
      least(l_quantity, l_tax * 100) AS le,
      pmod(l_orderkey, 7) AS pm7,
      CAST(l_quantity AS INT) AS qty_int,
      CAST(l_orderkey AS STRING) AS key_str
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100""",
    "t29_arrays" -> """WITH e AS (SELECT vec_id, CAST(embedding AS ARRAY<DOUBLE>) AS v FROM embeddings)
      SELECT vec_id, size(v) AS dim,
      round(sqrt(vec_dot(v, v)), 4) AS l2,
      size(filter(v, x -> x > 0)) AS n_pos,
      round(element_at(v, 1), 6) AS first_val,
      round(aggregate(slice(v, 1, 8), 0.0D, (a, x) -> a + x), 6) AS sum8,
      round(array_min(v), 6) AS mn,
      round(array_max(v), 6) AS mx
      FROM e ORDER BY vec_id LIMIT 100""",
    "t29_explode" -> """SELECT count(*) AS n FROM
      (SELECT explode(CAST(embedding AS ARRAY<DOUBLE>)) AS x FROM embeddings) WHERE x > 0.5""",

    // ---- LLM-pipeline queries as SQL (where library ops are SQL-expressible) ----
    "l7_multimodal_join" -> """SELECT lang, count(*) AS cnt, round(avg(n_chars), 2) AS avg_chars,
      count(DISTINCT label) AS n_labels
      FROM documents JOIN embeddings ON doc_id = vec_id
      GROUP BY lang ORDER BY lang""",
    "l9_token_count" -> """SELECT lang,
      sum(size(split(text, ' '))) AS ws_tokens,
      sum(regexp_count(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpeish_tokens
      FROM documents GROUP BY lang ORDER BY lang""",
    "l11_deterministic_sample" -> """SELECT count(*) AS sampled, min(doc_id) AS first_id
      FROM documents
      WHERE pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT), 100) < 20""",
    "l13_sequence_packing" -> """WITH toks AS (
        SELECT doc_id, size(split(text, ' ')) AS n FROM documents),
      c AS (SELECT doc_id, n, sum(n) OVER (ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum FROM toks)
      SELECT CAST(floor((cum - n) / 2048) AS BIGINT) AS bin,
             count(*) AS docs, sum(n) AS tokens
      FROM c GROUP BY 1 ORDER BY bin LIMIT 100""",
    "t30_pivot" -> """SELECT o_orderstatus,
        coalesce(p1, 0L) AS p1, coalesce(p2, 0L) AS p2, coalesce(p3, 0L) AS p3,
        coalesce(p4, 0L) AS p4, coalesce(p5, 0L) AS p5
      FROM (SELECT o_orderstatus, o_orderpriority FROM orders)
      PIVOT (count(1) FOR o_orderpriority IN (
        '1-URGENT' AS p1, '2-HIGH' AS p2, '3-MEDIUM' AS p3,
        '4-NOT SPECIFIED' AS p4, '5-LOW' AS p5))
      ORDER BY o_orderstatus""",
    "t31_unpivot" -> """SELECT p_partkey, metric, value FROM (
        SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size, p_retailprice FROM part)
      UNPIVOT (value FOR metric IN (p_size, p_retailprice))
      ORDER BY p_partkey, metric LIMIT 200""",
    // t32–t36 run the SUBQUERY forms through Spark's parser; Catalyst
    // decorrelates them into the same semi/anti/window plans the DataFrame
    // builders state explicitly (parity-asserted in SqlParitySpec).
    "t32_scalar_subquery" -> """SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
      WHERE o_totalprice > 2 * round(
        (SELECT avg(o2.o_totalprice) FROM orders o2 WHERE o2.o_custkey = o.o_custkey), 2)
      ORDER BY o_orderkey LIMIT 100""",
    "t33_exists" -> """SELECT count(*) AS n FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_orderpriority = '1-URGENT')
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""",
    "t34_in_subquery" -> """SELECT
      (SELECT count(*) FROM part WHERE p_partkey IN
        (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)) AS in_cnt,
      (SELECT count(*) FROM part WHERE p_partkey NOT IN
        (SELECT l_partkey FROM lineitem WHERE l_quantity >= 45)) AS not_in_cnt""",
    "t35_lateral" -> """SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
      FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice FROM orders o
        WHERE o.o_custkey = c.c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      WHERE c.c_custkey < 25
      ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""",
    "t36_cte" -> """WITH cnt AS (SELECT o_custkey, count(*) AS n, sum(o_totalprice) AS tot
        FROM orders GROUP BY o_custkey)
      SELECT c_mktsegment, count(*) AS customers,
        sum(coalesce(n, 0L)) AS orders_cnt,
        round(sum(coalesce(tot, 0D)), 2) AS revenue
      FROM customer LEFT JOIN cnt ON o_custkey = c_custkey
      GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    // Spark 4 pipe syntax — each |> stage parses to the same operators the
    // DataFrame twin builds
    "t38_pipe_sql" -> """FROM orders
      |> WHERE o_orderstatus = 'O'
      |> AGGREGATE count(*) AS cnt, round(sum(o_totalprice), 2) AS total
         GROUP BY o_orderpriority
      |> ORDER BY o_orderpriority""",
    "t37_ignore_nulls" -> """SELECT DISTINCT user_id,
      last_value(nullif(event_type, 'error')) IGNORE NULLS OVER w AS last_ok_type,
      nth_value(event_type, 2) OVER w AS second_type
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY user_id LIMIT 100""",
    // text_normalize is graft's own SQL function (GraftExtensions)
    "t26d_levenshtein" -> """SELECT p_partkey,
      levenshtein(p_brand, p_type) AS lev_brand_type,
      levenshtein(substring(p_name, 1, 10), p_brand) AS lev_name_brand
      FROM part ORDER BY p_partkey LIMIT 200""",
    "l11b_stratified_sample" -> """WITH b AS (SELECT doc_id, lang,
        pmod(CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 4), 16, 10) AS BIGINT), 100) AS bucket
      FROM documents)
      SELECT lang, count(*) AS sampled, min(doc_id) AS first_id FROM b
      WHERE bucket < CASE lang WHEN 'en' THEN 50 WHEN 'es' THEN 20 WHEN 'zh' THEN 10 ELSE -1 END
      GROUP BY lang ORDER BY lang""",
    "l14_repetition" -> """WITH toks AS (SELECT doc_id, explode(split(text, ' ')) AS tk FROM documents),
      tc AS (SELECT doc_id, tk, count(*) AS c FROM toks GROUP BY 1, 2),
      t1 AS (SELECT doc_id, sum(c) AS n_tokens,
               max(c) / CAST(sum(c) AS DOUBLE) AS top_token_frac FROM tc GROUP BY 1),
      d AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
      bg AS (SELECT doc_id, explode(transform(sequence(0, size(w) - 2),
               i -> concat_ws(' ', w[i], w[i+1]))) AS g FROM d WHERE size(w) >= 2),
      bc AS (SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2),
      b1 AS (SELECT doc_id, max(c) / CAST(sum(c) AS DOUBLE) AS top_bigram_frac FROM bc GROUP BY 1),
      tg AS (SELECT doc_id, explode(transform(sequence(0, size(w) - 3),
               i -> concat_ws(' ', w[i], w[i+1], w[i+2]))) AS g FROM d WHERE size(w) >= 3),
      gc AS (SELECT doc_id, g, count(*) AS c FROM tg GROUP BY 1, 2),
      g1 AS (SELECT doc_id, CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE) / sum(c)
               AS dup_trigram_frac FROM gc GROUP BY 1)
      SELECT t1.doc_id, n_tokens, round(top_token_frac, 4) AS top_token_frac,
        round(coalesce(b1.top_bigram_frac, 0), 4) AS top_bigram_frac,
        round(coalesce(g1.dup_trigram_frac, 0), 4) AS dup_trigram_frac
      FROM t1 LEFT JOIN b1 USING (doc_id) LEFT JOIN g1 USING (doc_id)
      ORDER BY doc_id""",
    "l15_contamination" -> """WITH d AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
      sh AS (SELECT doc_id,
          CASE WHEN size(w) >= 5
            THEN array_distinct(transform(sequence(0, size(w) - 5),
                 i -> concat_ws(' ', w[i], w[i+1], w[i+2], w[i+3], w[i+4])))
            ELSE array() END AS s
        FROM d),
      tg AS (SELECT doc_id AS test_id, explode(s) AS g FROM sh WHERE doc_id % 10 = 0),
      rg AS (SELECT doc_id AS train_id, explode(s) AS g FROM sh WHERE doc_id % 10 <> 0),
      p AS (SELECT test_id, train_id, count(*) AS shared FROM tg JOIN rg USING (g) GROUP BY 1, 2)
      SELECT test_id, count(*) AS n_train_docs, max(shared) AS max_shared
      FROM p GROUP BY test_id ORDER BY test_id""",

    "t42_funnel" -> """WITH s AS (SELECT user_id, min(ts) AS st FROM events
        WHERE event_type = 'signup' GROUP BY user_id),
      c AS (SELECT e.user_id, min(e.ts) AS ct FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'click' AND e.ts > s.st AND e.ts <= s.st + INTERVAL 24 HOURS
        GROUP BY e.user_id),
      p AS (SELECT e.user_id, min(e.ts) AS pt FROM events e JOIN c ON e.user_id = c.user_id
        WHERE e.event_type = 'purchase' AND e.ts > c.ct AND e.ts <= c.ct + INTERVAL 24 HOURS
        GROUP BY e.user_id),
      sp AS (SELECT p.user_id, s.st, p.pt FROM p JOIN s ON p.user_id = s.user_id)
      SELECT (SELECT count(*) FROM s) AS stage_signup,
        (SELECT count(*) FROM c) AS stage_click,
        (SELECT count(*) FROM p) AS stage_purchase,
        (SELECT sum(unix_millis(pt) - unix_millis(st)) FROM sp) AS total_ms_signup_to_purchase""",

    "t43_cohort" -> """WITH fw AS (SELECT user_id, to_date(date_trunc('week', min(ts))) AS cohort
        FROM events WHERE event_type = 'purchase' AND value > 150 GROUP BY user_id),
      wk AS (SELECT DISTINCT user_id, to_date(date_trunc('week', ts)) AS week
        FROM events WHERE event_type = 'purchase')
      SELECT cohort, CAST(datediff(week, cohort) / 7 AS INT) AS week_offset,
        count(DISTINCT fw.user_id) AS active_users
      FROM fw JOIN wk ON fw.user_id = wk.user_id
      WHERE week >= cohort
      GROUP BY cohort, week_offset ORDER BY cohort, week_offset""",

    "t44_outliers" -> """WITH thr AS (SELECT percentile(value, 0.99) AS p99 FROM events)
      SELECT event_type,
        sum(CASE WHEN value > (SELECT p99 FROM thr) THEN 1 ELSE 0 END) AS outliers,
        count(*) AS total
      FROM events GROUP BY event_type ORDER BY event_type""",

    "t46_constraints" -> """SELECT 'between:o_totalprice' AS rule,
        sum(CASE WHEN o_totalprice BETWEEN 0.0 AND 100000.0 THEN 0 ELSE 1 END) AS violations,
        count(*) AS total,
        sum(CASE WHEN o_totalprice BETWEEN 0.0 AND 100000.0 THEN 0 ELSE 1 END) = 0 AS passed
      FROM orders
      UNION ALL
      SELECT 'in_set:o_orderstatus',
        sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END),
        count(*),
        sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) = 0
      FROM orders
      UNION ALL
      SELECT 'not_null:o_custkey',
        sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END),
        count(*),
        sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) = 0
      FROM orders
      UNION ALL
      SELECT 'satisfies:order_after_1996',
        sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 0 ELSE 1 END),
        count(*),
        sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 0 ELSE 1 END) = 0
      FROM orders
      UNION ALL
      SELECT 'unique:o_orderkey',
        count(o_orderkey) - count(DISTINCT o_orderkey),
        count(*),
        count(o_orderkey) - count(DISTINCT o_orderkey) = 0
      FROM orders
      ORDER BY rule""")
}
