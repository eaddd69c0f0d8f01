package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.{GQuery, Spread, Tables}
import graft.functions.TextFunctions
import graft.operators.{FreqSketch, FuzzyJoin, Profile, Quality, Similarity, TimeSeries}

/** Round-4 analytics surface: column profiling, time-series gap fill,
  * funnel/cohort behavioral queries, exact heavy hitters, sketch set ops,
  * and the exhaustive-probe IVF parity check. Each is DuckDB-hash-matched
  * unless noted rows-only.
  */
object AnalyticsQueries {

  private def t(s: org.apache.spark.sql.SparkSession, dir: String, n: String) =
    Tables(s, dir, n)

  /** One-pass numeric column profile of `orders` (C2/C3 data-quality
    * analog at column granularity). */
  val t40 = GQuery(
    "t40_profile",
    (s, dir) =>
      Profile.numeric(t(s, dir, "orders"), Seq("o_custkey", "o_orderkey", "o_totalprice")),
    Some("""SELECT 'o_custkey' AS col_name, count(o_custkey) AS non_null,
        (SELECT count(*) FROM orders) - count(o_custkey) AS nulls,
        count(DISTINCT o_custkey) AS n_distinct,
        round(CAST(min(o_custkey) AS DOUBLE), 2) AS min_v,
        round(CAST(max(o_custkey) AS DOUBLE), 2) AS max_v,
        round(avg(o_custkey), 2) AS avg_v FROM orders
      UNION ALL
      SELECT 'o_orderkey', count(o_orderkey), (SELECT count(*) FROM orders) - count(o_orderkey),
        count(DISTINCT o_orderkey), round(CAST(min(o_orderkey) AS DOUBLE), 2),
        round(CAST(max(o_orderkey) AS DOUBLE), 2), round(avg(o_orderkey), 2) FROM orders
      UNION ALL
      SELECT 'o_totalprice', count(o_totalprice), (SELECT count(*) FROM orders) - count(o_totalprice),
        count(DISTINCT o_totalprice), round(CAST(min(o_totalprice) AS DOUBLE), 2),
        round(CAST(max(o_totalprice) AS DOUBLE), 2), round(avg(o_totalprice), 2) FROM orders
      ORDER BY col_name"""))

  /** Sparse daily series (high-value events) resampled onto the full
    * type × day grid: counts zero-filled, per-day max forward-filled.
    * The filled measure is max, not avg: source values are exact 2-decimal
    * doubles, so round(max,2) never lands on the half-at-scale boundary
    * where Spark (shortest-repr) and DuckDB (binary) round apart — avg's
    * division reintroduced exactly that (268.775 → 268.78 vs 268.77). */
  val t41 = GQuery(
    "t41_gap_fill",
    (s, dir) => {
      val e = t(s, dir, "events")
      val daily = e
        .where(col("value") > 190)
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(count(lit(1)).as("cnt"), round(max(col("value")), 2).as("ff_max"))
      val types = e.select(col("event_type")).distinct()
      val cal = s
        .range(1)
        .select(explode(sequence(
          lit(java.sql.Date.valueOf("2024-01-01")),
          lit(java.sql.Date.valueOf("2024-01-30")),
          expr("INTERVAL 1 DAY"))).as("day"))
      TimeSeries
        .gapFill(types, cal, daily, Seq("event_type"), "day",
          zeroFill = Map("cnt" -> lit(0L)), forwardFill = Seq("ff_max"))
        .select(col("event_type"), col("day"), col("cnt"), col("ff_max"))
        .orderBy(col("event_type"), col("day"))
    },
    Some("""WITH cal AS (SELECT CAST(unnest(generate_series(DATE '2024-01-01', DATE '2024-01-30',
          INTERVAL 1 DAY)) AS DATE) AS day),
        types AS (SELECT DISTINCT event_type FROM events),
        grid AS (SELECT event_type, day FROM types CROSS JOIN cal),
        daily AS (SELECT event_type AS de, CAST(ts AS DATE) AS dd, count(*) AS c,
            round(max(value), 2) AS mv
          FROM events WHERE value > 190 GROUP BY 1, 2)
      SELECT g.event_type, g.day, CAST(coalesce(d.c, 0) AS BIGINT) AS cnt,
        last_value(d.mv IGNORE NULLS) OVER (PARTITION BY g.event_type ORDER BY g.day
          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ff_max
      FROM grid g LEFT JOIN daily d ON g.event_type = d.de AND g.day = d.dd
      ORDER BY event_type, day"""))

  /** Conversion funnel signup → click → purchase, each stage within 24 h
    * of the previous stage's first qualifying event, plus total end-to-end
    * conversion time. The time is an exact BIGINT millisecond sum — never a
    * rounded average, whose division can land on the half-at-scale boundary
    * where the engines round apart. epoch_ms/unix_millis agree exactly
    * (DuckDB epoch() would truncate to whole seconds — avoided). */
  val t42 = GQuery(
    "t42_funnel",
    (s, dir) => {
      val e = t(s, dir, "events")
      val day = expr("INTERVAL 24 HOURS")
      val s1 = e.where(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("st"))
      val c1 = e.where(col("event_type") === "click")
        .join(s1, "user_id")
        .where(col("ts") > col("st") && col("ts") <= col("st") + day)
        .groupBy(col("user_id")).agg(min(col("ts")).as("ct"))
      val p1 = e.where(col("event_type") === "purchase")
        .join(c1, "user_id")
        .where(col("ts") > col("ct") && col("ts") <= col("ct") + day)
        .groupBy(col("user_id")).agg(min(col("ts")).as("pt"))
      val sp = p1.join(s1, "user_id")
      s1.agg(count(lit(1)).as("stage_signup"))
        .crossJoin(c1.agg(count(lit(1)).as("stage_click")))
        .crossJoin(p1.agg(count(lit(1)).as("stage_purchase")))
        .crossJoin(sp.agg(
          sum(unix_millis(col("pt")) - unix_millis(col("st")))
            .as("total_ms_signup_to_purchase")))
    },
    Some("""WITH s AS (SELECT user_id, min(ts) AS st FROM events
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
        (SELECT CAST(sum(epoch_ms(pt) - epoch_ms(st)) AS BIGINT) FROM sp)
          AS total_ms_signup_to_purchase"""))

  /** Weekly retention triangle: cohort = ISO week of first high-value
    * purchase; activity = any purchase week at or after the cohort week.
    * Monday-aligned weeks on both engines make day-diff/7 exact, so the
    * double division never hits the cast-rounding divergence (Spark cast
    * truncates, DuckDB rounds — irrelevant on exact .0 values). */
  val t43 = GQuery(
    "t43_cohort",
    (s, dir) => {
      val purch = t(s, dir, "events").where(col("event_type") === "purchase")
      val first = purch
        .where(col("value") > 150)
        .groupBy(col("user_id")).agg(min(col("ts")).as("first_ts"))
        .select(col("user_id"), to_date(date_trunc("week", col("first_ts"))).as("cohort"))
      val wk = purch
        .select(col("user_id"), to_date(date_trunc("week", col("ts"))).as("week"))
        .distinct()
      first.join(wk, "user_id")
        .where(col("week") >= col("cohort"))
        .groupBy(col("cohort"),
          (datediff(col("week"), col("cohort")) / 7).cast("int").as("week_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
        .orderBy(col("cohort"), col("week_offset"))
    },
    Some("""WITH first AS (SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort
          FROM events WHERE event_type = 'purchase' AND value > 150 GROUP BY user_id),
        wk AS (SELECT DISTINCT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
          FROM events WHERE event_type = 'purchase')
      SELECT cohort, CAST(date_diff('day', cohort, week) / 7 AS INT) AS week_offset,
        count(DISTINCT f.user_id) AS active_users
      FROM first f JOIN wk ON f.user_id = wk.user_id
      WHERE week >= cohort
      GROUP BY cohort, week_offset ORDER BY cohort, week_offset"""))

  /** Exact corpus heavy hitters (tokens with count > N/50) through the
    * Misra–Gries candidate pass — result provably equals the full groupBy
    * + HAVING, which is exactly what the oracle runs. */
  val l23 = GQuery(
    "l23_heavy_hitters",
    (s, dir) => {
      val toks = Spread.ifNarrow(t(s, dir, "documents"))
        .select(explode(TextFunctions.tokens(col("text"))).as("term"))
      FreqSketch.heavyHitters(toks, "term", k = 50)
    },
    Some("""WITH toks AS (SELECT unnest(string_split(text, ' ')) AS term FROM documents),
        tot AS (SELECT count(*) AS n FROM toks)
      SELECT term, count(*) AS cnt FROM toks GROUP BY term
      HAVING count(*) > (SELECT n FROM tot) / 50
      ORDER BY cnt DESC, term"""))

  /** IVF with nProbe = all cells is exhaustive search — must hash-match
    * the brute-force top-k oracle exactly (same tie-break). Proves the
    * cell-route/probe/re-rank machinery loses nothing when told to look
    * everywhere; the approximate variants differ only in probe count. */
  val l3ivfx = GQuery(
    "l3_ann_ivf_exhaustive",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
      // "exhaustive" must not silently depend on the generator keeping the
      // label cardinality under a hardcoded probe count: derive nProbe from
      // the actual cell count (one tiny count job at query-build time).
      val cells = e.agg(countDistinct(col("label"))).head().getLong(0).toInt
      Similarity
        .ivfTopK(e, "vec_id", "embedding", "label", k = 3, nProbe = cells)
        .select(col("vec_id"), col("rank"), col("nn_id"), round(col("cosine"), 4).as("cosine"))
        .orderBy(col("vec_id"), col("rank"))
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        n AS (SELECT vec_id, v, sqrt(list_inner_product(v, v)) AS nrm FROM e),
        pairs AS (SELECT q.vec_id, c.vec_id AS nn_id,
            list_inner_product(q.v, c.v) / (q.nrm * c.nrm) AS cosine
          FROM n q JOIN n c ON q.vec_id <> c.vec_id),
        ranked AS (SELECT vec_id, nn_id, cosine,
            row_number() OVER (PARTITION BY vec_id ORDER BY cosine DESC, nn_id) AS rank
          FROM pairs)
      SELECT vec_id, rank, nn_id, round(cosine, 4) AS cosine
      FROM ranked WHERE rank <= 3 ORDER BY vec_id, rank"""))

  /** Sketch set-algebra: |F ∩ O| estimated as hll(F)+hll(O)-hll(F∪O) in a
    * single scan with no distinct shuffle — the 100 TB alternative to
    * INTERSECT's two exchanges (b14 is the exact form). Rows-only by
    * design (HLL estimates are engine-specific); ±5% of exact asserted in
    * AnalyticsSpec. */
  val b14b = GQuery(
    "b14b_sketch_intersect",
    (s, dir) =>
      t(s, dir, "orders").agg(
        approx_count_distinct(when(col("o_orderstatus") === "F", col("o_custkey"))).as("hll_f"),
        approx_count_distinct(when(col("o_orderstatus") === "O", col("o_custkey"))).as("hll_o"),
        approx_count_distinct(when(col("o_orderstatus").isin("F", "O"), col("o_custkey")))
          .as("hll_union"))
        .select(col("hll_f"), col("hll_o"),
          (col("hll_f") + col("hll_o") - col("hll_union")).as("est_intersect")),
    None)

  /** Driver-checkable twin of b14b: emit the EXACT intersect cardinality
    * (one grouped membership pass, same shape as b14) plus a boolean
    * asserting the inclusion–exclusion HLL estimate lands within 10% of it
    * (measured error 3.8% at sf0.01 — the band covers the worst case of
    * three combined ±2% sketches). Oracle: exact INTERSECT count + literal
    * TRUE. The scalar crossJoin combines two 1-row aggregates. */
  val b14c = GQuery(
    "b14c_sketch_intersect_check",
    (s, dir) => {
      val o = t(s, dir, "orders")
      val exact = o.filter(col("o_orderstatus").isin("F", "O"))
        .groupBy(col("o_custkey"))
        .agg(
          max(when(col("o_orderstatus") === "F", 1).otherwise(0)).as("in_f"),
          max(when(col("o_orderstatus") === "O", 1).otherwise(0)).as("in_o"))
        .agg(sum(col("in_f") * col("in_o")).cast("long").as("exact_intersect"))
      val est = o.agg(
        (approx_count_distinct(when(col("o_orderstatus") === "F", col("o_custkey"))) +
          approx_count_distinct(when(col("o_orderstatus") === "O", col("o_custkey"))) -
          approx_count_distinct(when(col("o_orderstatus").isin("F", "O"), col("o_custkey"))))
          .as("__est"))
      exact.crossJoin(est).select(
        col("exact_intersect"),
        (abs(col("__est") - col("exact_intersect")) <= col("exact_intersect") * lit(0.10))
          .as("within_band"))
    },
    Some("""SELECT CAST(count(*) AS BIGINT) AS exact_intersect, TRUE AS within_band FROM (
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
      INTERSECT
      SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') t"""))

  /** Outliers above the exact global p99. A threshold COMPARISON can't be
    * rounded like an aggregate, but it is robust here: both engines
    * interpolate the same two sorted 2-decimal values, so their thresholds
    * differ by ≤ 1 ulp while sitting ≥ 1e-4 away from any data value —
    * no count can flip. (stddev-based z-scores would NOT be safe: variance
    * accumulation order differs across engines.) */
  val t44 = GQuery(
    "t44_outliers",
    (s, dir) => {
      val e = t(s, dir, "events")
      val thr = e.agg(percentile(col("value"), lit(0.99)).as("p99"))
      e.crossJoin(broadcast(thr))
        .groupBy(col("event_type"))
        .agg(
          sum(when(col("value") > col("p99"), 1L).otherwise(0L)).as("outliers"),
          count(lit(1)).as("total"))
        .orderBy(col("event_type"))
    },
    Some("""WITH thr AS (SELECT quantile_cont(value, 0.99) AS p99 FROM events)
      SELECT event_type,
        CAST(sum(CASE WHEN value > (SELECT p99 FROM thr) THEN 1 ELSE 0 END) AS BIGINT) AS outliers,
        count(*) AS total
      FROM events GROUP BY event_type ORDER BY event_type"""))

  /** Edit-distance ≤ 1 self-join over customer names through the
    * delete-neighborhood equi-join — the oracle runs the O(n²) cross join
    * the operator exists to avoid, so the match proves the pruning lost
    * nothing. Summary row (19.5k pairs at sf0.01 — too wide to dump). */
  val t45 = GQuery(
    "t45_fuzzy_join",
    (s, dir) => {
      val names = graft.Spread.ifNarrow(t(s, dir, "customer"))
      FuzzyJoin.editDistanceJoin(names, "c_name", names, "c_name", maxDist = 1)
        .where(col("a") < col("b"))
        .agg(count(lit(1)).as("pairs"),
          countDistinct(col("a")).as("left_names"),
          countDistinct(col("b")).as("right_names"))
    },
    Some("""SELECT count(*) AS pairs, count(DISTINCT an) AS left_names,
        count(DISTINCT bn) AS right_names
      FROM (SELECT a.c_name AS an, b.c_name AS bn FROM customer a JOIN customer b
        ON a.c_name < b.c_name WHERE levenshtein(a.c_name, b.c_name) <= 1) p"""))

  /** Data-quality audit of `orders`: five constraint kinds, one pass,
    * exact violation counts. Rules chosen so both outcomes appear (the
    * price band and date floor fail; keys and enums hold). */
  val t46 = GQuery(
    "t46_constraints",
    (s, dir) =>
      Quality.check(t(s, dir, "orders"), Seq(
        Quality.NotNull("o_custkey"),
        Quality.Unique("o_orderkey"),
        Quality.InSet("o_orderstatus", Seq("F", "O", "P")),
        Quality.Between("o_totalprice", 0.0, 100000.0),
        Quality.Satisfies("order_after_1996",
          col("o_orderdate") >= lit("1996-01-01").cast("timestamp")))),
    Some("""SELECT 'between:o_totalprice' AS rule,
        CAST(sum(CASE WHEN o_totalprice BETWEEN 0.0 AND 100000.0 THEN 0 ELSE 1 END) AS BIGINT)
          AS violations,
        count(*) AS total,
        CAST(sum(CASE WHEN o_totalprice BETWEEN 0.0 AND 100000.0 THEN 0 ELSE 1 END) AS BIGINT) = 0
          AS passed
      FROM orders
      UNION ALL
      SELECT 'in_set:o_orderstatus',
        CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS BIGINT),
        count(*),
        CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P') THEN 0 ELSE 1 END) AS BIGINT) = 0
      FROM orders
      UNION ALL
      SELECT 'not_null:o_custkey',
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        count(*),
        CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
      FROM orders
      UNION ALL
      SELECT 'satisfies:order_after_1996',
        CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 0 ELSE 1 END) AS BIGINT),
        count(*),
        CAST(sum(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01' THEN 0 ELSE 1 END) AS BIGINT) = 0
      FROM orders
      UNION ALL
      SELECT 'unique:o_orderkey',
        count(o_orderkey) - count(DISTINCT o_orderkey),
        count(*),
        count(o_orderkey) - count(DISTINCT o_orderkey) = 0
      FROM orders
      ORDER BY rule"""))

  /** As-of join with a staleness tolerance (pandas merge_asof semantics):
    * purchases match their latest prior signup only when it is ≤ 6 h old.
    * Exercises the two-sided `AsOfJoin.asof` entry (b13 runs the
    * single-scan tagged form) plus the tolerance post-filter, which is
    * exact because the latest prior row is also the nearest prior row. */
  val t47 = GQuery(
    "t47_asof_tolerance",
    (s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      graft.operators.AsOfJoin
        .asof(purchases, signups, Seq("user_id"), "ts", "signup_ts",
          rightPayload = Nil, toleranceMs = Some(6L * 3600 * 1000))
        .agg(count(lit(1)).as("matched"), round(sum(col("value")), 2).as("total_value"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase'),
        s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'signup'),
        m AS (SELECT p.event_id, max(p.value) AS value,
                     max(epoch_ms(p.ts)) AS pms, max(epoch_ms(s.ts)) AS sms
              FROM p JOIN s ON s.user_id = p.user_id AND s.ts <= p.ts
              GROUP BY p.event_id)
      SELECT count(*) AS matched, round(sum(value), 2) AS total_value
      FROM m WHERE pms - sms <= 21600000"""))

  /** Forward as-of (pandas merge_asof direction='forward'): each purchase
    * matches the EARLIEST signup at/after it. Same single-shuffle window
    * plan as backward, traversed descending. */
  val t48 = GQuery(
    "t48_asof_forward",
    (s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      graft.operators.AsOfJoin
        .asof(purchases, signups, Seq("user_id"), "ts", "signup_ts",
          rightPayload = Nil, direction = "forward")
        .agg(count(lit(1)).as("matched"), round(sum(col("value")), 2).as("total_value"),
          round(sum((unix_micros(col("signup_ts")) - unix_micros(col("ts"))) / lit(1000000.0)), 2)
            .as("total_lead_s"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase'),
        s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'signup'),
        m AS (SELECT p.event_id, max(p.value) AS value,
                     max(epoch_us(p.ts)) AS pus, min(epoch_us(s.ts)) AS sus
              FROM p JOIN s ON s.user_id = p.user_id AND s.ts >= p.ts
              GROUP BY p.event_id)
      SELECT count(*) AS matched, round(sum(value), 2) AS total_value,
             round(sum((sus - pus) / 1000000.0), 2) AS total_lead_s FROM m"""))

  /** Nearest as-of (pandas merge_asof direction='nearest', ties backward):
    * closest signup in either direction — two sorts over ONE shuffle, never
    * a range join. Oracle ranks the O(n·m) candidate pairs by absolute
    * distance with the same tie rule. */
  val t49 = GQuery(
    "t49_asof_nearest",
    (s, dir) => {
      val e = t(s, dir, "events")
      val purchases = e.where(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
      val signups = e.where(col("event_type") === "signup")
        .select(col("user_id"), col("ts").as("signup_ts"))
      graft.operators.AsOfJoin
        .asof(purchases, signups, Seq("user_id"), "ts", "signup_ts",
          rightPayload = Nil, direction = "nearest")
        .agg(count(lit(1)).as("matched"), round(sum(col("value")), 2).as("total_value"),
          round(sum(abs(unix_micros(col("signup_ts")) - unix_micros(col("ts"))) / lit(1000000.0)), 2)
            .as("total_dist_s"))
    },
    Some("""WITH p AS (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts, value
          FROM events WHERE event_type = 'purchase'),
        s AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts FROM events WHERE event_type = 'signup'),
        cand AS (SELECT p.event_id, p.value,
                        abs(epoch_us(s.ts) - epoch_us(p.ts)) AS dus,
                        CASE WHEN s.ts <= p.ts THEN 0 ELSE 1 END AS fwd
                 FROM p JOIN s ON s.user_id = p.user_id),
        r AS (SELECT event_id, value, dus,
                     row_number() OVER (PARTITION BY event_id ORDER BY dus, fwd) AS rn
              FROM cand)
      SELECT count(*) AS matched, round(sum(value), 2) AS total_value,
             round(sum(dus / 1000000.0), 2) AS total_dist_s
      FROM r WHERE rn = 1"""))

  /** W13: event-sequence pattern matching (MATCH_RECOGNIZE-lite) — every
    * view → click → purchase chain per user in strict row order
    * (earliest-next binding), completed within 24 h, with no error event
    * between consecutive stages; per-user match counts + first/last bind
    * timestamps. The oracle replays the identical construction: one
    * position window, min-over-following next-stage pointers, two
    * pointer-equality joins. */
  val t50 = GQuery(
    "t50_pattern_match",
    (s, dir) =>
      graft.operators.Patterns.sequenceMatches(
        t(s, dir, "events"), "user_id", "ts", "event_id",
        Seq(
          "view" -> (col("event_type") === "view"),
          "click" -> (col("event_type") === "click"),
          "purchase" -> (col("event_type") === "purchase")),
        withinSeconds = Some(86400L),
        noIntervening = Some(col("event_type") === "error"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("matches"),
          min(col("ts_1")).as("first_start"), max(col("ts_3")).as("last_end"))
        .orderBy(col("user_id")),
    Some("""WITH ev AS (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, event_id, event_type FROM events),
      o AS (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS pos FROM ev),
      nx AS (SELECT user_id, ts, event_type, pos,
               min(CASE WHEN event_type = 'click' THEN pos END)
                 OVER w AS n_click,
               min(CASE WHEN event_type = 'purchase' THEN pos END)
                 OVER w AS n_buy,
               min(CASE WHEN event_type = 'error' THEN pos END)
                 OVER w AS n_err
             FROM o
             WINDOW w AS (PARTITION BY user_id ORDER BY pos
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)),
      m1 AS (SELECT user_id, ts AS ts1, n_click, n_err FROM nx WHERE event_type = 'view'),
      m2 AS (SELECT m1.user_id, m1.ts1, b.ts AS ts2, b.n_buy, b.n_err AS g2
             FROM m1 JOIN nx b ON b.user_id = m1.user_id AND b.pos = m1.n_click
             WHERE m1.n_err IS NULL OR m1.n_err >= m1.n_click),
      m3 AS (SELECT m2.user_id, m2.ts1, c.ts AS ts3
             FROM m2 JOIN nx c ON c.user_id = m2.user_id AND c.pos = m2.n_buy
             WHERE m2.g2 IS NULL OR m2.g2 >= m2.n_buy)
      SELECT user_id, CAST(count(*) AS BIGINT) AS matches,
             min(ts1) AS first_start, max(ts3) AS last_end
      FROM m3 WHERE epoch_us(ts3) - epoch_us(ts1) <= 86400000000
      GROUP BY user_id ORDER BY user_id"""))

  /** T51 DRIFT: per-bucket PSI of `events.value` between the first half of
    * the month (reference slice) and the rest (current slice) — the
    * data-quality drift monitor a production feed runs per batch. Fixed
    * bucket contract [0, 500) × 10; contributions in integer micro-units
    * (the l26 determinism pattern). One map-side-combined aggregation on
    * the bucket key — monitoring cost is a single narrow pass at any SF. */
  val t51 = GQuery(
    "t51_drift",
    (s, dir) =>
      Profile.psi(t(s, dir, "events"),
        col("value"), col("ts") < lit("2024-01-15").cast("timestamp"),
        lo = 0.0, hi = 500.0, nBuckets = 10),
    Some("""WITH b AS (SELECT CAST(LEAST(GREATEST(floor(value / 50.0), 0), 9) AS INT) AS bucket,
          (ts < TIMESTAMP '2024-01-15') AS is_ref FROM events),
      c AS (SELECT bucket,
          sum(CASE WHEN is_ref THEN 1 ELSE 0 END) AS cnt_ref,
          sum(CASE WHEN NOT is_ref THEN 1 ELSE 0 END) AS cnt_cur
        FROM b GROUP BY bucket),
      f AS (SELECT bucket, cnt_ref, cnt_cur,
          GREATEST(CAST(cnt_ref AS DOUBLE) / CAST(sum(cnt_ref) OVER () AS DOUBLE), 1e-6) AS p_ref,
          GREATEST(CAST(cnt_cur AS DOUBLE) / CAST(sum(cnt_cur) OVER () AS DOUBLE), 1e-6) AS p_cur
        FROM c)
      SELECT bucket, CAST(cnt_ref AS BIGINT) AS cnt_ref, CAST(cnt_cur AS BIGINT) AS cnt_cur,
        CAST(round((p_ref - p_cur) * ln(p_ref / p_cur) * 1000000.0) AS BIGINT) AS psi_micro
      FROM f ORDER BY bucket"""))

  /** T52 RANK STATISTICS: ntile / percent_rank / cume_dist per user over
    * purchase values — the distribution-rank window family (W5's rank/
    * dense_rank siblings). Fractions in integer micro-units (l26
    * determinism contract: both engines compute the identical
    * (rank−1)/(n−1) and rows≤/n rationals, one integral rounding). One
    * window shuffle on the user key. */
  val t52 = GQuery(
    "t52_rank_stats",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("value"), col("event_id"))
      t(s, dir, "events")
        .where(col("event_type") === "purchase" && col("user_id") < 20)
        .select(col("user_id"), col("event_id"),
          ntile(4).over(w).as("quartile"),
          round(percent_rank().over(w) * 1000000).cast("long").as("pr_micro"),
          round(cume_dist().over(w) * 1000000).cast("long").as("cd_micro"))
        .orderBy(col("user_id"), col("event_id"))
    },
    Some("""SELECT user_id, event_id,
        ntile(4) OVER w AS quartile,
        CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS pr_micro,
        CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cd_micro
      FROM events WHERE event_type = 'purchase' AND user_id < 20
      WINDOW w AS (PARTITION BY user_id ORDER BY value, event_id)
      ORDER BY user_id, event_id"""))

  /** T53 LIST AGGREGATION: collect_set → sorted csv per key (the listagg/
    * string_agg family) + row counts — deterministic by sorting inside the
    * aggregate before concatenation (an UNSORTED listagg is
    * order-nondeterministic by construction on both engines). Map-side
    * partial collect_set, one hash-agg shuffle on the key. */
  val t53 = GQuery(
    "t53_string_agg",
    (s, dir) =>
      t(s, dir, "events").where(col("user_id") < 12)
        .groupBy(col("user_id"))
        .agg(concat_ws(",", array_sort(collect_set(col("event_type")))).as("types"),
          count(lit(1)).as("cnt"))
        .orderBy(col("user_id")),
    Some("""SELECT user_id,
        string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS types,
        count(*) AS cnt
      FROM events WHERE user_id < 12 GROUP BY user_id ORDER BY user_id"""))

  /** T54 BIVARIATE STATISTICS: the correlation/regression aggregate family
    * (corr, covar_pop, regr_slope, regr_intercept) per group — A-family
    * siblings of the moment aggregates. Both engines accumulate stable
    * co-moments; rounding is chosen per statistic for cross-engine float
    * agreement (ratios of co-moments — corr, slope — are precise to ~1e-12
    * and round at 6 dp; raw co-moments — covariance, intercept — carry
    * summation-order noise up to ~1e-4 at this magnitude and round at
    * 2 dp). One map-side-combined aggregation, no extra pass. */
  val t54 = GQuery(
    "t54_corr_stats",
    (s, dir) =>
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_extendedprice"), col("l_quantity")), 6).as("corr_pq"),
          round(covar_pop(col("l_extendedprice"), col("l_quantity")), 2).as("covar_pq"),
          round(expr("regr_slope(l_extendedprice, l_quantity)"), 6).as("slope"),
          round(expr("regr_intercept(l_extendedprice, l_quantity)"), 2).as("icept"),
          count(lit(1)).as("cnt"))
        .orderBy(col("l_returnflag")),
    Some("""SELECT l_returnflag,
        round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
        round(covar_pop(l_extendedprice, l_quantity), 2) AS covar_pq,
        round(regr_slope(l_extendedprice, l_quantity), 6) AS slope,
        round(regr_intercept(l_extendedprice, l_quantity), 2) AS icept,
        count(*) AS cnt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** T55 PAGERANK: link-analysis centrality over the customer–supplier
    * bipartite trade graph (edges both directions so no node dangles),
    * 6 fixed iterations in exact long micro-unit arithmetic
    * ([[graft.operators.Graph.pageRank]]) — bit-identical across
    * partitionings and engines, so the oracle replays the identical
    * integer recurrence as 6 unrolled CTE steps. */
  val t55 = GQuery(
    "t55_pagerank",
    (s, dir) => {
      // both directions fanned out in ONE pass over the join (a union of
      // two selects would recompute the 600k-row join per branch); the
      // operator's own dedup collapses repeats in a single shuffle
      val edges = graft.Spread.ifNarrow(t(s, dir, "orders"))
        .join(graft.Spread.ifNarrow(t(s, dir, "lineitem")), col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("cust"), (col("l_suppkey") + 1000000L).as("supp"))
        .select(explode(array(
          struct(col("cust").as("src"), col("supp").as("dst")),
          struct(col("supp").as("src"), col("cust").as("dst")))).as("e"))
        .select(col("e.src").as("src"), col("e.dst").as("dst"))
      graft.operators.Graph.pageRank(edges, "src", "dst", iterations = 6)
        .orderBy(col("rank").desc, col("node"))
        .limit(20)
        .select(col("node"), col("rank").as("rank_micro"))
    },
    Some {
      val steps = (1 to 6).map { k =>
        s"""c$k AS (SELECT e.dst AS node, sum(r${k - 1}.rank // d.deg) AS s
          FROM e JOIN r${k - 1} ON e.src = r${k - 1}.node JOIN d ON e.src = d.src
          GROUP BY e.dst),
        r$k AS (SELECT n.node, CAST(150000 + coalesce(c$k.s, 0) // 1000000 * 850000
            + coalesce(c$k.s, 0) % 1000000 * 850000 // 1000000 AS BIGINT) AS rank
          FROM n LEFT JOIN c$k ON n.node = c$k.node)"""
      }.mkString(",\n        ")
      s"""WITH b AS (SELECT DISTINCT o_custkey AS cust, l_suppkey + 1000000 AS supp
          FROM orders JOIN lineitem ON l_orderkey = o_orderkey),
        e AS (SELECT cust AS src, supp AS dst FROM b UNION SELECT supp, cust FROM b),
        n AS (SELECT DISTINCT src AS node FROM e UNION SELECT DISTINCT dst FROM e),
        d AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS rank FROM n),
        $steps
        SELECT node, rank AS rank_micro FROM r6 ORDER BY rank_micro DESC, node LIMIT 20"""
    })

  /** T57 TIME-WEIGHTED AVERAGE: the irregular-series mean that weights
    * each observation by how long it was in force (Σ v·Δt / Σ Δt, Δt to
    * the next event per key) — the TWAP/telemetry-average op a plain AVG
    * gets wrong on uneven sampling. One window shuffle for the lead, one
    * aggregation; Δt in exact long µs, the ratio rounded at 6 dp (ratios
    * of co-moments are precise to ~1e-12 cross-engine). */
  val t57 = GQuery(
    "t57_twap",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events")
        .where(col("user_id") < 40)
        .select(col("user_id"), col("value"), unix_micros(col("ts")).as("tsu"),
          lead(unix_micros(col("ts")), 1).over(w).as("nxtu"))
        .where(col("nxtu").isNotNull)
        .select(col("user_id"), col("value"), (col("nxtu") - col("tsu")).as("dt_us"))
        .groupBy(col("user_id"))
        .agg(round(sum(col("value") * col("dt_us")) / sum(col("dt_us")), 6).as("twap"),
          count(lit(1)).as("n_intervals"))
        .orderBy(col("user_id"))
    },
    Some("""WITH s AS (SELECT user_id, ts, value, event_id,
        lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
      FROM events WHERE user_id < 40),
      w AS (SELECT user_id, value,
        CAST(epoch_us(nxt) - epoch_us(ts) AS BIGINT) AS dt_us
      FROM s WHERE nxt IS NOT NULL)
      SELECT user_id, round(sum(value * dt_us) / sum(dt_us), 6) AS twap,
        count(*) AS n_intervals
      FROM w GROUP BY user_id ORDER BY user_id"""))

  /** T58 OHLC BARS: per-(key, day) open/high/low/close downsampling — the
    * financial/telemetry bar aggregation. Open/close are min_by/max_by on
    * a zero-padded (epoch-µs, event_id) composite string key, so ties on
    * ts stay deterministic cross-engine (lexicographic == numeric under
    * the padding); one map-side-combined aggregation, no window. */
  val t58 = GQuery(
    "t58_ohlc",
    (s, dir) => {
      val ordKey = format_string("%020d-%010d", unix_micros(col("ts")), col("event_id"))
      t(s, dir, "events")
        .where(col("user_id") < 8)
        .groupBy(col("user_id"), to_date(date_trunc("day", col("ts"))).as("day"))
        .agg(min_by(col("value"), ordKey).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), ordKey).as("close"),
          count(lit(1)).as("n"))
        .orderBy(col("user_id"), col("day"))
    },
    Some("""SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
        arg_min(value, printf('%020d-%010d', epoch_us(ts), event_id)) AS open,
        max(value) AS high, min(value) AS low,
        arg_max(value, printf('%020d-%010d', epoch_us(ts), event_id)) AS close,
        count(*) AS n
      FROM events WHERE user_id < 8
      GROUP BY user_id, CAST(date_trunc('day', ts) AS DATE)
      ORDER BY user_id, day"""))

  /** T60 TRIANGLE COUNTS: graph cohesion over the co-supplier graph
    * (suppliers sharing an order are adjacent; shared pairs across orders
    * collapse) via [[graft.operators.Graph.triangleCounts]]'s
    * degree-ordered orientation — every triangle found exactly once as a
    * forward path closed by a semi join, wedge fan-out bounded by forward
    * degrees (the O(E^1.5) classic), no windows or cross-joins. The
    * oracle replays the identical orientation and closure in SQL. */
  val t60 = GQuery(
    "t60_triangles",
    (s, dir) => {
      // deterministic 1-in-20 order sample: the raw co-occurrence graph is
      // near-complete (every supplier pair eventually shares some order),
      // and a near-complete graph makes ANY triangle algorithm Θ(n³) — the
      // sparsifier keeps the graph's density realistic, not the operator
      val li = graft.Spread.ifNarrow(t(s, dir, "lineitem"))
        .where(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      val edges = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
        .select(col("x.sk").as("s1"), col("y.sk").as("s2"))
      graft.operators.Graph.triangleCounts(edges, "s1", "s2")
        .orderBy(col("tri_cnt").desc, col("node"))
        .limit(20)
        .select(col("node"), col("tri_cnt"))
    },
    Some("""WITH pr AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        WHERE x.l_orderkey % 20 = 0),
      deg AS (SELECT n, count(*) AS d FROM (
          SELECT a AS n FROM pr UNION ALL SELECT b FROM pr) GROUP BY n),
      o AS (SELECT
          CASE WHEN da.d < db.d OR (da.d = db.d AND pr.a < pr.b) THEN pr.a ELSE pr.b END AS u,
          CASE WHEN da.d < db.d OR (da.d = db.d AND pr.a < pr.b) THEN pr.b ELSE pr.a END AS v
        FROM pr JOIN deg da ON da.n = pr.a JOIN deg db ON db.n = pr.b),
      tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
        FROM o e1 JOIN o e2 ON e1.v = e2.u
        WHERE EXISTS (SELECT 1 FROM o e3 WHERE e3.u = e1.u AND e3.v = e2.v)),
      pernode AS (SELECT node, count(*) AS tri_cnt FROM (
          SELECT x AS node FROM tri
          UNION ALL SELECT y FROM tri
          UNION ALL SELECT z FROM tri)
        GROUP BY node)
      SELECT node, tri_cnt FROM pernode ORDER BY tri_cnt DESC, node LIMIT 20"""))

  /** T61 BOUNDED-HOP BFS: shortest hop distance from a seed set (nation-0
    * suppliers) over the sparsified co-supplier graph, ≤ 3 hops, via
    * [[graft.operators.Graph.hopDistances]]'s frontier BFS — per round
    * one broadcast equi-join of the stationary edge frame plus one
    * anti-join against the settled set, edges never shuffled. The oracle
    * is DuckDB's recursive CTE over the same graph: hash-matching it
    * proves the iterative frontier plan computes exactly the fixpoint
    * semantics a SQL user would write. */
  val t61 = GQuery(
    "t61_bfs_hops",
    (s, dir) => {
      val li = graft.Spread.ifNarrow(t(s, dir, "lineitem"))
        .where(col("l_orderkey") % 20 === 0)
        .select(col("l_orderkey").as("ok"), col("l_suppkey").as("sk"))
      val edges = li.as("x").join(li.as("y"),
          col("x.ok") === col("y.ok") && col("x.sk") < col("y.sk"))
        .select(col("x.sk").as("s1"), col("y.sk").as("s2")).distinct()
      val seeds = t(s, dir, "supplier")
        .where(col("s_nationkey") === 0).select(col("s_suppkey"))
      graft.operators.Graph.hopDistances(edges, "s1", "s2", seeds, "s_suppkey", 3)
        .orderBy(col("node"))
    },
    Some("""WITH RECURSIVE pr AS (SELECT DISTINCT x.l_suppkey AS a, y.l_suppkey AS b
        FROM lineitem x JOIN lineitem y
          ON x.l_orderkey = y.l_orderkey AND x.l_suppkey < y.l_suppkey
        WHERE x.l_orderkey % 20 = 0),
      e AS (SELECT a AS src, b AS dst FROM pr UNION ALL SELECT b, a FROM pr),
      bfs AS (
        SELECT s_suppkey AS node, 0 AS dist FROM supplier WHERE s_nationkey = 0
        UNION
        SELECT e.dst, bfs.dist + 1 FROM bfs JOIN e ON e.src = bfs.node
        WHERE bfs.dist < 3)
      SELECT node, min(dist) AS dist FROM bfs GROUP BY node ORDER BY node"""))

  /** T62 EWMA + ANOMALY SCREEN: per-user exponentially-weighted moving
    * average (α = 0.25 over the last 8 observations) and the 50 events
    * deviating most from their own smoothed history — the telemetry
    * anomaly-triage primitive. The recursive EWMA is re-expressed as an
    * EXPLICIT 8-term lag polynomial so it is a pure window computation
    * (one shuffle on user_id, no self-joins, no per-row lists) AND
    * bit-identical cross-engine: every coefficient (1-α)^k and every
    * partial-window normalizer Σ(1-α)^k is an exactly-representable
    * binary fraction written as a literal, additions run in one fixed
    * left-to-right order on both sides, so the doubles match to the last
    * ulp before rounding. */
  val t62 = GQuery(
    "t62_ewma_anomaly",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val cs = Seq(1.0, 0.75, 0.5625, 0.421875, 0.31640625, 0.2373046875,
        0.177978515625, 0.13348388671875)
      val num = cs.zipWithIndex.map { case (c, k) =>
        (if (k == 0) col("value")
         else coalesce(lag(col("value"), k).over(w), lit(0.0))) * lit(c)
      }.reduce(_ + _)
      val den = expr("""CASE least(rn, 8) WHEN 1 THEN 1.0 WHEN 2 THEN 1.75
        WHEN 3 THEN 2.3125 WHEN 4 THEN 2.734375 WHEN 5 THEN 3.05078125
        WHEN 6 THEN 3.2880859375 WHEN 7 THEN 3.466064453125
        ELSE 3.59954833984375 END""")
      t(s, dir, "events").where(col("user_id") < 20)
        .withColumn("rn", row_number().over(w)).withColumn("num", num)
        .withColumn("ewma_raw", col("num") / den)
        .select(col("user_id"), col("event_id"),
          round(col("value"), 6).as("value"),
          round(col("ewma_raw"), 6).as("ewma"),
          round(abs(col("value") - col("ewma_raw")), 6).as("dev"))
        .orderBy(col("dev").desc, col("user_id"), col("event_id"))
        .limit(50)
    },
    Some("""WITH s AS (
        SELECT user_id, event_id, value, row_number() OVER w AS rn,
          value * 1.0
            + (lag(value, 1, 0.0) OVER w) * 0.75
            + (lag(value, 2, 0.0) OVER w) * 0.5625
            + (lag(value, 3, 0.0) OVER w) * 0.421875
            + (lag(value, 4, 0.0) OVER w) * 0.31640625
            + (lag(value, 5, 0.0) OVER w) * 0.2373046875
            + (lag(value, 6, 0.0) OVER w) * 0.177978515625
            + (lag(value, 7, 0.0) OVER w) * 0.13348388671875 AS num
        FROM events WHERE user_id < 20
        WINDOW w AS (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP), event_id)),
      e AS (SELECT user_id, event_id, value,
          num / (CASE least(rn, 8) WHEN 1 THEN 1.0 WHEN 2 THEN 1.75
            WHEN 3 THEN 2.3125 WHEN 4 THEN 2.734375 WHEN 5 THEN 3.05078125
            WHEN 6 THEN 3.2880859375 WHEN 7 THEN 3.466064453125
            ELSE 3.59954833984375 END) AS ewma_raw
        FROM s)
      SELECT user_id, event_id, round(value, 6) AS value,
        round(ewma_raw, 6) AS ewma, round(abs(value - ewma_raw), 6) AS dev
      FROM e ORDER BY dev DESC, user_id, event_id LIMIT 50"""))

  /** T71 TRANSPARENT MV ROUTING (A20): the aggregate is written against
    * the BASE lineitem table; [[graft.plans.MvRoutingRule]] re-plans it
    * against a freshly-built (flag, status, shipdate) rollup MV — the
    * oracle aggregates the base in DuckDB, so a hash match proves the
    * routed answer equals the base answer end-to-end (sum/count/avg/max
    * re-derived from MV partials, key filter re-applied per MV group).
    * MvRoutingSpec carries the physical proof the MV is what's scanned,
    * plus every bail path. At 100 TB this plan reads |key tuples| MV
    * rows instead of the fact table. */
  val t71 = GQuery(
    "t71_mv_rollup_routing",
    (s, dir) => {
      // registry hygiene: the MV is built over a COPY of the base file in
      // /tmp, not the shared testdata path — registering the real path
      // would transparently re-route every other gate query aggregating
      // lineitem (correct, but the gate should test each plan as written)
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_mv_li_" +
        Integer.toHexString(dir.hashCode)
      val base = s"$stage/base/lineitem.parquet"
      val mvDir = s"$stage/mv"
      val src = new org.apache.hadoop.fs.Path(s"$dir/lineitem.parquet")
      val dst = new org.apache.hadoop.fs.Path(base)
      val fs = dst.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.mkdirs(dst.getParent)
      org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dst, false, true,
        s.sparkContext.hadoopConfiguration)
      graft.plans.Mv.create(s, base, mvDir,
        keys = Seq("l_returnflag", "l_linestatus", "l_shipdate"),
        measures = Seq("l_quantity", "l_extendedprice"))
      s.read.parquet(base)
        .where(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(max(col("l_extendedprice")), 2).as("max_price"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt,
        round(avg(l_extendedprice), 4) AS avg_price,
        round(max(l_extendedprice), 2) AS max_price
      FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** T83 INCREMENTAL MV MAINTENANCE (A20i): the lifecycle t71 routes one
    * snapshot of — a Delta base is MV'd at v0, a second slice lands at
    * v1, and [[graft.plans.Mv.refreshIncremental]] folds the CHANGE FEED
    * into the MV: affected groups recomputed exactly from the current
    * snapshot (semi-joined to the feed's distinct keys), every other MV
    * row carried over untouched (MvRoutingSpec proves the carry-over
    * physically via a surviving tamper, and the delete-retracts-min/max
    * case). The query then aggregates the BASE — routed onto the
    * refreshed MV — while the oracle aggregates full lineitem in DuckDB:
    * a hash match proves base == slice₀ ∪ slice₁ == routed MV end to
    * end. At 100 TB the refresh reads the new files plus the affected
    * groups' footprint, never the table. */
  val t83 = GQuery(
    "t83_mv_incremental",
    (s, dir) => {
      val stage = s"${System.getProperty("java.io.tmpdir")}/graft_mvinc_" +
        Integer.toHexString(dir.hashCode)
      val p = new org.apache.hadoop.fs.Path(stage)
      val fs = p.getFileSystem(s.sparkContext.hadoopConfiguration)
      fs.delete(p, true) // fresh lifecycle every run — appends must not stack
      val tbl = s"$stage/tbl"
      val li = t(s, dir, "lineitem").select(col("l_returnflag"),
        col("l_linestatus"), col("l_quantity"), col("l_extendedprice"))
      graft.sources.DeltaWrite.append(s, li.where(col("l_linestatus") === "F"), tbl)
      graft.plans.Mv.createDelta(s, tbl, s"$stage/mv",
        keys = Seq("l_returnflag", "l_linestatus"),
        measures = Seq("l_quantity", "l_extendedprice"))
      graft.sources.DeltaWrite.append(s, li.where(col("l_linestatus") =!= "F"), tbl)
      graft.plans.Mv.refreshIncremental(s, s"$stage/mv")
      graft.sources.DeltaRead.snapshot(s, tbl)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("cnt"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(min(col("l_quantity")), 2).as("min_qty"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
        round(sum(l_quantity), 2) AS sum_qty, count(*) AS cnt,
        round(avg(l_extendedprice), 4) AS avg_price,
        round(min(l_quantity), 2) AS min_qty
      FROM lineitem GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  /** T72 GEO NEAREST JOIN (J13): nearest supplier site per customer site
    * over deterministic key-derived coordinates (the fixtures carry no
    * geography; identical integer/float arithmetic on both engines makes
    * the derivation an oracle-safe column). The engine side is
    * [[graft.operators.GeoOps.nearest]] — a 3×3 spherical-band-grid
    * EQUI-join (per-band longitude cell widths keep the exactness
    * certificate uniform at every latitude; polar bands are one cell)
    * with a map-side-combined min(struct) argmin and an all-pairs
    * fallback only for rows whose nearest exceeds one cell width —
    * while the oracle is the brute-force cross join it must reproduce
    * row-for-row. GeoSpec proves exactness on the hard cases (date
    * line, empty cells, polar bands). */
  val t72 = GQuery(
    "t72_geo_nearest",
    (s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0).as("clat"),
        ((col("c_custkey") * 91 % 3600) / lit(10.0) - 180.0).as("clon"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"),
        ((col("s_suppkey") * 53 % 1700) / lit(10.0) - 85.0).as("slat"),
        ((col("s_suppkey") * 131 % 3600) / lit(10.0) - 180.0).as("slon"))
      graft.operators.GeoOps.nearest(cust, "c_custkey", "clat", "clon",
          supp, "s_suppkey", "slat", "slon", cellDeg = 15.0)
        .select(col("c_custkey"), col("nearest_s_suppkey"),
          round(col("km"), 3).as("km"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH c AS (SELECT c_custkey,
        (c_custkey*37 % 1700)/10.0 - 85.0 AS clat,
        (c_custkey*91 % 3600)/10.0 - 180.0 AS clon FROM customer),
      s AS (SELECT s_suppkey,
        (s_suppkey*53 % 1700)/10.0 - 85.0 AS slat,
        (s_suppkey*131 % 3600)/10.0 - 180.0 AS slon FROM supplier),
      d AS (SELECT c_custkey, s_suppkey,
        2*6371.0088*asin(sqrt(pow(sin(radians(slat-clat)/2),2)
          + cos(radians(clat))*cos(radians(slat))*pow(sin(radians(slon-clon)/2),2))) AS km
        FROM c CROSS JOIN s),
      r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn
        FROM d)
      SELECT c_custkey, s_suppkey AS nearest_s_suppkey, round(km, 3) AS km
      FROM r WHERE rn = 1 ORDER BY c_custkey"""))

  /** T73 GEO RADIUS JOIN (J13r): suppliers within 2000 km of each
    * customer site, rolled up per customer (count + nearest-in-radius
    * distance). The engine side is [[graft.operators.GeoOps.withinRadius]]
    * — the 3×3 spherical-band-grid equi-join whose uniform certificate
    * (out-of-window ≥ one cell width ≥ radius, at every latitude — polar
    * bands are one all-longitude cell) removes the fallback entirely: at
    * 100 TB the pair volume tracks cell occupancy, never |L|·|R|, and no
    * latitude class degrades. Oracle = the brute-force cross-join filter
    * it must reproduce pair-for-pair (a missing or duplicated pair
    * breaks cnt and the hash). */
  val t73 = GQuery(
    "t73_geo_radius",
    (s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0).as("clat"),
        ((col("c_custkey") * 91 % 3600) / lit(10.0) - 180.0).as("clon"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"),
        ((col("s_suppkey") * 53 % 1700) / lit(10.0) - 85.0).as("slat"),
        ((col("s_suppkey") * 131 % 3600) / lit(10.0) - 180.0).as("slon"))
      graft.operators.GeoOps.withinRadius(cust, "c_custkey", "clat", "clon",
          supp, "s_suppkey", "slat", "slon", radiusKm = 2000.0, cellDeg = 30.0)
        .groupBy(col("c_custkey"))
        .agg(count(lit(1)).as("n_near"), round(min(col("km")), 3).as("min_km"))
        .orderBy(col("c_custkey"))
    },
    Some("""WITH c AS (SELECT c_custkey,
        (c_custkey*37 % 1700)/10.0 - 85.0 AS clat,
        (c_custkey*91 % 3600)/10.0 - 180.0 AS clon FROM customer),
      s AS (SELECT s_suppkey,
        (s_suppkey*53 % 1700)/10.0 - 85.0 AS slat,
        (s_suppkey*131 % 3600)/10.0 - 180.0 AS slon FROM supplier),
      d AS (SELECT c_custkey, s_suppkey,
        2*6371.0088*asin(sqrt(pow(sin(radians(slat-clat)/2),2)
          + cos(radians(clat))*cos(radians(slat))*pow(sin(radians(slon-clon)/2),2))) AS km
        FROM c CROSS JOIN s)
      SELECT c_custkey, count(*) AS n_near, round(min(km), 3) AS min_km
      FROM d WHERE km <= 2000.0
      GROUP BY c_custkey ORDER BY c_custkey"""))

  /** T88 GEO K-NN JOIN (J13k): the 3 nearest supplier sites per customer
    * site — [[graft.operators.GeoOps.nearestK]], the top-k generalization
    * of t72's nearest. Per tier the bounded TopKAggregator carries k rows
    * per customer across the shuffle (never the candidate set), a row
    * certifies when its k-th in-window distance clears the tier bound,
    * and only uncertifiable rows descend the 3×3 → 5×5 → exact ladder.
    * Oracle = the brute-force cross join + row_number ≤ 3 the operator
    * must reproduce row-for-row. */
  val t88 = GQuery(
    "t88_geo_knn",
    (s, dir) => {
      val cust = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0).as("clat"),
        ((col("c_custkey") * 91 % 3600) / lit(10.0) - 180.0).as("clon"))
      val supp = t(s, dir, "supplier").select(col("s_suppkey"),
        ((col("s_suppkey") * 53 % 1700) / lit(10.0) - 85.0).as("slat"),
        ((col("s_suppkey") * 131 % 3600) / lit(10.0) - 180.0).as("slon"))
      graft.operators.GeoOps.nearestK(cust, "c_custkey", "clat", "clon",
          supp, "s_suppkey", "slat", "slon", k = 3, cellDeg = 15.0)
        .select(col("c_custkey"), col("rank"), col("s_suppkey"),
          round(col("km"), 3).as("km"))
        .orderBy(col("c_custkey"), col("rank"))
    },
    Some("""WITH c AS (SELECT c_custkey,
        (c_custkey*37 % 1700)/10.0 - 85.0 AS clat,
        (c_custkey*91 % 3600)/10.0 - 180.0 AS clon FROM customer),
      s AS (SELECT s_suppkey,
        (s_suppkey*53 % 1700)/10.0 - 85.0 AS slat,
        (s_suppkey*131 % 3600)/10.0 - 180.0 AS slon FROM supplier),
      d AS (SELECT c_custkey, s_suppkey,
        2*6371.0088*asin(sqrt(pow(sin(radians(slat-clat)/2),2)
          + cos(radians(clat))*cos(radians(slat))*pow(sin(radians(slon-clon)/2),2))) AS km
        FROM c CROSS JOIN s),
      r AS (SELECT *, row_number() OVER (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn
        FROM d)
      SELECT c_custkey, CAST(rn AS INT) AS rank, s_suppkey, round(km, 3) AS km
      FROM r WHERE rn <= 3 ORDER BY c_custkey, rank"""))

  /** T86 GEOFENCE JOIN (J14): which fence contains each customer site —
    * the third geo shape after nearest (t72) and radius (t73). Fences are
    * 25 deterministic kite quadrilaterals derived from nation keys (pure
    * integer/decimal arithmetic — no trig, so both engines build
    * byte-identical vertices); points are t72's customer sites. The
    * engine side is [[graft.operators.GeoOps.geofence]]: polygons
    * register under the band-grid cells their bbox overlaps, points
    * equi-join on their single cell, and the codegen'd ray-cast HOF
    * decides containment only inside candidate cells — candidate volume
    * tracks fence density, never |points|·|fences|, with NO fallback
    * path. Oracle = the brute-force edges×points crossing-parity SQL the
    * join must reproduce pair-for-pair (rolled up per fence; a missing
    * or duplicated pair breaks n_inside and sum_ids). */
  val t86 = GQuery(
    "t86_geo_fence",
    (s, dir) => {
      val pts = t(s, dir, "customer").select(col("c_custkey"),
        ((col("c_custkey") * 37 % 1700) / lit(10.0) - 85.0).as("plat"),
        ((col("c_custkey") * 91 % 3600) / lit(10.0) - 180.0).as("plon"))
      val g = t(s, dir, "nation").select(col("n_nationkey").as("poly_id"),
        ((col("n_nationkey") * 97 % 1400) / lit(10.0) - 70.0).as("clat"),
        ((col("n_nationkey") * 139 % 3300) / lit(10.0) - 165.0).as("clon"),
        (lit(2.0) + (col("n_nationkey") * 7 % 80) / lit(10.0)).as("dy"),
        (lit(2.0) + (col("n_nationkey") * 11 % 80) / lit(10.0)).as("dx"))
      val fences = g.select(col("poly_id"), array(
        struct((col("clat") + col("dy")).as("lat"), col("clon").as("lon")),
        struct(col("clat").as("lat"), (col("clon") + col("dx")).as("lon")),
        struct((col("clat") - col("dy")).as("lat"), col("clon").as("lon")),
        struct(col("clat").as("lat"), (col("clon") - col("dx")).as("lon"))
      ).as("verts"))
      graft.operators.GeoOps.geofence(pts, "c_custkey", "plat", "plon",
          fences, "poly_id", "verts", cellDeg = 15.0)
        .groupBy(col("poly_id"))
        .agg(count(lit(1)).as("n_inside"), sum(col("c_custkey")).as("sum_ids"))
        .orderBy(col("poly_id"))
    },
    Some("""WITH p AS (SELECT c_custkey,
        (c_custkey*37 % 1700)/10.0 - 85.0 AS plat,
        (c_custkey*91 % 3600)/10.0 - 180.0 AS plon FROM customer),
      g AS (SELECT n_nationkey AS poly_id,
        (n_nationkey*97 % 1400)/10.0 - 70.0 AS clat,
        (n_nationkey*139 % 3300)/10.0 - 165.0 AS clon,
        2.0 + (n_nationkey*7 % 80)/10.0 AS dy,
        2.0 + (n_nationkey*11 % 80)/10.0 AS dx FROM nation),
      v AS (SELECT poly_id, 0 AS seq, clat + dy AS lat, clon AS lon FROM g
        UNION ALL SELECT poly_id, 1, clat, clon + dx FROM g
        UNION ALL SELECT poly_id, 2, clat - dy, clon FROM g
        UNION ALL SELECT poly_id, 3, clat, clon - dx FROM g),
      e AS (SELECT a.poly_id, a.lat AS y1, a.lon AS x1, b.lat AS y2, b.lon AS x2
        FROM v a JOIN v b ON a.poly_id = b.poly_id AND b.seq = (a.seq + 1) % 4),
      hits AS (SELECT p.c_custkey, e.poly_id,
          sum(CASE WHEN (y1 > plat) <> (y2 > plat)
               AND plon < (x2 - x1) * (plat - y1) / (y2 - y1) + x1
              THEN 1 ELSE 0 END) AS crossings
        FROM p CROSS JOIN e GROUP BY p.c_custkey, e.poly_id)
      SELECT poly_id, count(*) AS n_inside,
        CAST(sum(c_custkey) AS BIGINT) AS sum_ids
      FROM hits WHERE crossings % 2 = 1
      GROUP BY poly_id ORDER BY poly_id"""))

  val all: Seq[GQuery] =
    Seq(t40, t41, t42, t43, t44, t45, t46, t47, t48, t49, t50, t51, t52, t53, t54, t55,
      t57, t58, t60, t61, t62, t71, t72, t73, t83, t86, t88,
      l23, l3ivfx, b14b, b14c)
}
