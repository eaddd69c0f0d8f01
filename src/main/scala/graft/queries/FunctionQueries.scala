package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}
import graft.functions.VectorOps

/** T26–T29 (SURVEY.md §2.7): scalar function families (string / date / math /
  * array) hash-matched vs the DuckDB oracle, with the documented name/arg
  * rewrites (instr⇄strpos, datediff⇄date_diff reversed args, ln, pmod). */
object FunctionQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  val t26 = GQuery(
    "t26_strings",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          split(col("p_name"), " ").getItem(0).as("first_token"),
          upper(col("p_name")).as("upper_name"),
          length(col("p_name")).as("name_len"),
          regexp_extract(col("p_name"), "(\\w+)$", 1).as("last_word"),
          lpad(col("p_brand"), 12, "#").as("padded_brand"),
          expr("replace(p_type, ' ', '_')").as("type_snake"),
          instr(col("p_type"), "a").as("a_pos"),
          concat_ws("-", col("p_brand"), col("p_type")).as("brand_type"),
          substring(col("p_name"), 1, 5).as("name5"),
          col("p_name").startsWith("a").as("starts_a"),
          col("p_name").endsWith("e").as("ends_e"))
        .orderBy(col("p_partkey"))
        .limit(200),
    Some("""SELECT p_partkey,
      string_split(p_name, ' ')[1] AS first_token,
      upper(p_name) AS upper_name,
      CAST(length(p_name) AS INTEGER) AS name_len,
      regexp_extract(p_name, '(\w+)$', 1) AS last_word,
      lpad(p_brand, 12, '#') AS padded_brand,
      replace(p_type, ' ', '_') AS type_snake,
      CAST(strpos(p_type, 'a') AS INTEGER) AS a_pos,
      concat_ws('-', p_brand, p_type) AS brand_type,
      substring(p_name, 1, 5) AS name5,
      (p_name LIKE 'a%') AS starts_a,
      (p_name LIKE '%e') AS ends_e
      FROM part ORDER BY p_partkey LIMIT 200"""))

  val t27 = GQuery(
    "t27_dates",
    (s, dir) => {
      val o = t(s, dir, "orders")
      o.select(
          year(col("o_orderdate")).as("yr"),
          quarter(col("o_orderdate")).as("qtr"),
          month(col("o_orderdate")).as("mo"),
          datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date")).as("days_since"),
          unix_timestamp(col("o_orderdate")).as("epoch_s"),
          date_add(col("o_orderdate").cast("date"), 30).as("plus30"))
        .groupBy(col("yr"), col("qtr"))
        .agg(
          count(lit(1)).as("cnt"),
          countDistinct(col("mo")).as("n_months"),
          min(col("days_since")).as("min_days"),
          max(col("days_since")).as("max_days"),
          min(col("epoch_s")).as("min_epoch"),
          min(col("plus30")).as("min_plus30"))
        .orderBy(col("yr"), col("qtr"))
    },
    Some("""SELECT CAST(year(o_orderdate) AS INTEGER) AS yr,
      CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
      count(*) AS cnt,
      count(DISTINCT month(o_orderdate)) AS n_months,
      CAST(min(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS INTEGER) AS min_days,
      CAST(max(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))) AS INTEGER) AS max_days,
      CAST(min(epoch(o_orderdate)) AS BIGINT) AS min_epoch,
      min(CAST(o_orderdate AS DATE) + 30) AS min_plus30
      FROM orders GROUP BY 1, 2 ORDER BY yr, qtr"""))

  val t28 = GQuery(
    "t28_math",
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          round(sqrt(col("l_extendedprice")), 4).as("sqrt_price"),
          round(pow(lit(1) + col("l_discount"), 3), 6).as("pow_disc"),
          round(log(col("l_extendedprice")), 6).as("ln_price"),
          round(exp(col("l_discount")), 6).as("exp_disc"),
          abs(col("l_quantity") - 25).as("abs_qty"),
          ceil(col("l_extendedprice") / 1000).as("ceil_k"),
          floor(col("l_extendedprice") / 1000).as("floor_k"),
          signum(col("l_quantity") - lit(25.0)).as("sgn"),
          greatest(col("l_quantity"), col("l_discount") * 100).as("gr"),
          least(col("l_quantity"), col("l_tax") * 100).as("le"),
          pmod(col("l_orderkey"), lit(7)).as("pm7"),
          col("l_quantity").cast("int").as("qty_int"),
          col("l_orderkey").cast("string").as("key_str"))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(100),
    Some("""SELECT l_orderkey, l_linenumber,
      round(sqrt(l_extendedprice), 4) AS sqrt_price,
      round(pow(1 + l_discount, 3), 6) AS pow_disc,
      round(ln(l_extendedprice), 6) AS ln_price,
      round(exp(l_discount), 6) AS exp_disc,
      abs(l_quantity - 25) AS abs_qty,
      CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS ceil_k,
      CAST(floor(l_extendedprice / 1000) AS BIGINT) AS floor_k,
      CAST(sign(l_quantity - 25.0) AS DOUBLE) AS sgn,
      greatest(l_quantity, l_discount * 100) AS gr,
      least(l_quantity, l_tax * 100) AS le,
      CAST(((l_orderkey % 7) + 7) % 7 AS BIGINT) AS pm7,
      CAST(l_quantity AS INTEGER) AS qty_int,
      CAST(l_orderkey AS VARCHAR) AS key_str
      FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100"""))

  val t29 = GQuery(
    "t29_arrays",
    (s, dir) => {
      val v = VectorOps.asDouble(col("embedding"))
      t(s, dir, "embeddings")
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(sqrt(VectorOps.norm2(v)), 4).as("l2"),
          size(filter(v, x => x > 0)).as("n_pos"),
          round(element_at(v, 1), 6).as("first_val"),
          round(aggregate(slice(v, 1, 8), lit(0.0), (a, x) => a + x), 6).as("sum8"),
          round(array_min(v), 6).as("mn"),
          round(array_max(v), 6).as("mx"))
        .orderBy(col("vec_id"))
        .limit(100)
    },
    Some("""WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      SELECT vec_id, CAST(len(v) AS INTEGER) AS dim,
      round(sqrt(list_reduce(list_transform(v, x -> x * x), (a, b) -> a + b)), 4) AS l2,
      CAST(len(list_filter(v, x -> x > 0)) AS INTEGER) AS n_pos,
      round(v[1], 6) AS first_val,
      round(list_reduce(v[1:8], (a, b) -> a + b), 6) AS sum8,
      round(list_min(v), 6) AS mn,
      round(list_max(v), 6) AS mx
      FROM e ORDER BY vec_id LIMIT 100"""))

  val t29explode = GQuery(
    "t29_explode",
    (s, dir) =>
      t(s, dir, "embeddings")
        .select(explode(VectorOps.asDouble(col("embedding"))).as("x"))
        .where(col("x") > 0.5)
        .agg(count(lit(1)).as("n")),
    Some("""SELECT count(*) AS n FROM
      (SELECT unnest(embedding::DOUBLE[]) AS x FROM embeddings) WHERE x > 0.5"""))

  /** Custom typed UDAF (Aggregator) through the SQL surface — quantity-
    * weighted mean price per return flag. */
  val tUdaf = GQuery(
    "t_udaf_weighted_mean",
    (s, dir) => {
      graft.functions.Aggregators.register(s)
      t(s, dir, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(round(expr("weighted_mean(l_extendedprice, l_quantity)"), 2).as("wmean_price"))
        .orderBy(col("l_returnflag"))
    },
    Some("""SELECT l_returnflag,
      round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2) AS wmean_price
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""))

  /** Multimodal REAL decode end-to-end: every doc_id becomes an actual
    * BMP / WAV / PPM file (deterministic integer content), the payloads are
    * parsed by the real container codecs (header fields, row padding, RIFF
    * chunk walk, PPM grammar), and the decoded pixel/sample sums aggregate
    * per modality. The oracle recomputes the same integer sums from the
    * generator formulas — a wrong header field, padding mistake, or
    * sign-extension bug all break the hash match. */
  val tMultimodal = GQuery(
    "t_multimodal_features",
    (s, dir) => {
      import graft.multimodal.Multimodal
      val recs = Multimodal.withRealPayloads(s, t(s, dir, "documents"))
      Multimodal.decodeStats(recs).toDF()
        .groupBy(col("modality"))
        .agg(count(lit(1)).as("cnt"),
          sum(col("n_units")).cast("long").as("n_units"),
          sum(col("sum_v")).cast("long").as("sum_v"))
        .orderBy(col("modality"))
    },
    Some("""WITH series AS (SELECT CAST(unnest(range(0, 64)) AS BIGINT) AS k),
      img AS (
        SELECT d.doc_id,
               ((d.doc_id*7 + x.k*3 + y.k*5) % 256
              + (d.doc_id*11 + x.k*2 + y.k*3) % 256
              + (d.doc_id*13 + x.k*5 + y.k*2) % 256) AS v
        FROM documents d JOIN series x ON x.k <= d.doc_id % 8
             JOIN series y ON y.k <= d.doc_id % 6
        WHERE d.doc_id % 3 = 0),
      aud AS (
        SELECT d.doc_id, ((d.doc_id*31 + i.k*7) % 65536) - 32768 AS v
        FROM documents d JOIN series i ON i.k <= (d.doc_id % 50) + 9
        WHERE d.doc_id % 3 = 1),
      vid AS (
        SELECT d.doc_id,
               ((d.doc_id*3 + x.k*7 + y.k*11) % 256
              + (d.doc_id*5 + x.k*11 + y.k*7) % 256
              + (d.doc_id*17 + x.k + y.k) % 256) AS v
        FROM documents d JOIN series x ON x.k <= d.doc_id % 7
             JOIN series y ON y.k <= d.doc_id % 5
        WHERE d.doc_id % 3 = 2),
      allm AS (
        SELECT 'image' AS modality, doc_id, v FROM img
        UNION ALL SELECT 'audio', doc_id, v FROM aud
        UNION ALL SELECT 'video', doc_id, v FROM vid)
      SELECT modality, CAST(count(DISTINCT doc_id) AS BIGINT) AS cnt,
             CAST(count(*) AS BIGINT) AS n_units, CAST(sum(v) AS BIGINT) AS sum_v
      FROM allm GROUP BY modality ORDER BY modality"""))

  /** F7 second form: declared-schema JSON extraction (`from_json` into a
    * struct) — same values as the path-based `get_json_object` (B8). */
  val tFromJson = GQuery(
    "t_from_json",
    (s, dir) =>
      t(s, dir, "events")
        .select(col("event_type"),
          from_json(col("props"), org.apache.spark.sql.types.StructType.fromDDL("k INT"))
            .getField("k").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k").cast("long")).as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy(col("event_type")),
    BenchQueries.b8.oracle)

  /** F7 third form: semi-structured VARIANT (Spark 4) — `try_parse_json`
    * into a Variant value once, then typed path extraction with
    * `variant_get`. Unlike per-path `get_json_object` re-parses, the parse
    * cost is paid once per row however many paths are extracted, and the
    * binary Variant encoding is what the parquet Variant shredding story
    * builds on. Values hash-match the path-based B8. */
  val tVariant = GQuery(
    "t_variant_json",
    (s, dir) =>
      graft.Spread.ifNarrow(t(s, dir, "events"))
        .select(col("event_type"), try_parse_json(col("props")).as("v"))
        .select(col("event_type"),
          expr("variant_get(v, '$.k', 'long')").as("k"))
        .groupBy(col("event_type"))
        .agg(sum(col("k")).as("sum_k"), count(lit(1)).as("cnt"))
        .orderBy(col("event_type")),
    BenchQueries.b8.oracle)

  /** F1/F2 completion: rpad, trim, plain concat, make_date. */
  val t26b = GQuery(
    "t26b_more_strings",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          rpad(col("p_brand"), 12, "#").as("rpadded"),
          trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
          concat(col("p_brand"), lit("/"), col("p_type")).as("joined"),
          make_date(lit(1995) + (col("p_partkey") % 5).cast("int"),
            (col("p_partkey") % 12 + 1).cast("int"), lit(1)).as("md"))
        .orderBy(col("p_partkey"))
        .limit(100),
    Some("""SELECT p_partkey,
      rpad(p_brand, 12, '#') AS rpadded,
      trim(concat('  ', p_name, '  ')) AS trimmed,
      concat(p_brand, '/', p_type) AS joined,
      make_date(CAST(1995 + p_partkey % 5 AS INTEGER),
                CAST(p_partkey % 12 + 1 AS INTEGER), 1) AS md
      FROM part ORDER BY p_partkey LIMIT 100"""))

  /** Unicode normalization (custom codegen'd Catalyst expression): the same
    * text planted in both composed (é) and combining (e+U+0301) forms must
    * canonicalize identically; STRIP removes the diacritics entirely.
    * Oracle: DuckDB nfc_normalize / strip_accents. */
  val t26c = GQuery(
    "t26c_normalize",
    (s, dir) => {
      import graft.functions.TextExpressions.normalizeText
      val decorated = concat(lit("Café vs Café: "), substring(col("text"), 1, 30))
      t(s, dir, "documents")
        .where(col("doc_id") < 50)
        .select(
          col("doc_id"),
          normalizeText(decorated).as("nfc"),
          normalizeText(decorated, "strip").as("stripped"),
          (normalizeText(lit("Café")) === normalizeText(lit("Café"))).as("forms_equal"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id,
      nfc_normalize(concat('Café vs Café: ', substring(text, 1, 30))) AS nfc,
      strip_accents(nfc_normalize(concat('Café vs Café: ', substring(text, 1, 30)))) AS stripped,
      nfc_normalize('Café') = nfc_normalize('Café') AS forms_equal
      FROM documents WHERE doc_id < 50 ORDER BY doc_id"""))

  /** Edit distance (F1 completion) — fuzzy matching for entity resolution. */
  val t26d = GQuery(
    "t26d_levenshtein",
    (s, dir) =>
      t(s, dir, "part")
        .select(
          col("p_partkey"),
          levenshtein(col("p_brand"), col("p_type")).as("lev_brand_type"),
          levenshtein(substring(col("p_name"), 1, 10), col("p_brand")).as("lev_name_brand"))
        .orderBy(col("p_partkey"))
        .limit(200),
    Some("""SELECT p_partkey,
      CAST(levenshtein(p_brand, p_type) AS INTEGER) AS lev_brand_type,
      CAST(levenshtein(substring(p_name, 1, 10), p_brand) AS INTEGER) AS lev_name_brand
      FROM part ORDER BY p_partkey LIMIT 200"""))

  /** F1 completion: regexp_extract_all, split_part, translate, reverse,
    * repeat — the remaining string functions with direct DuckDB twins. */
  val t26e = GQuery(
    "t26e_regexp_all",
    (s, dir) =>
      t(s, dir, "part")
        .select(col("p_partkey"),
          concat_ws(",", regexp_extract_all(col("p_name"), lit("[a-z]+"), lit(0))).as("words"),
          split_part(col("p_name"), lit(" "), lit(2)).as("w2"),
          translate(col("p_type"), "AEIOU", "aeiou").as("ty"),
          reverse(col("p_brand")).as("rb"),
          expr("repeat('x', p_size % 5)").as("rp"))
        .orderBy(col("p_partkey"))
        .limit(100),
    Some("""SELECT p_partkey,
      array_to_string(regexp_extract_all(p_name, '[a-z]+'), ',') AS words,
      split_part(p_name, ' ', 2) AS w2,
      translate(p_type, 'AEIOU', 'aeiou') AS ty,
      reverse(p_brand) AS rb,
      repeat('x', p_size % 5) AS rp
      FROM part ORDER BY p_partkey LIMIT 100"""))

  /** A4 counterpart for percentiles: approx_percentile (t-digest-style
    * sketch). Sketches differ across engines, so no hash oracle — the
    * rows-only entry proves the surface; FunctionSpecs asserts the approx
    * median lands within 2% of the exact percentile. Unlike HLL, quantile-
    * sketch merge is partition-order-sensitive: values may shift with
    * layout/core-count changes (row COUNT stays stable, and that is all
    * the rows-only check records). */
  val t16b = GQuery(
    "t16b_approx_percentile",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          round(expr("approx_percentile(o_totalprice, 0.5, 1000)"), 2).as("approx_median"),
          round(expr("approx_percentile(o_totalprice, 0.9, 1000)"), 2).as("approx_p90"))
        .orderBy(col("o_orderstatus")),
    None)

  /** Driver-checkable twin of t16b: sketch values are engine- and
    * layout-specific, but the accuracy claim is checkable — per group, emit
    * the exact median and a boolean asserting BOTH approx quantiles land
    * within 2% of their exact counterparts (measured error ≤ 0.16% at
    * sf0.01, so the band has 10× margin against quantile-sketch merge-order
    * drift). Oracle: exact quantile_cont + literal TRUE. */
  val t16c = GQuery(
    "t16c_approx_percentile_check",
    (s, dir) =>
      t(s, dir, "orders")
        .groupBy(col("o_orderstatus"))
        .agg(
          expr("percentile(o_totalprice, 0.5)").as("__ex50"),
          expr("percentile(o_totalprice, 0.9)").as("__ex90"),
          expr("approx_percentile(o_totalprice, 0.5, 1000)").as("__ap50"),
          expr("approx_percentile(o_totalprice, 0.9, 1000)").as("__ap90"))
        .select(
          col("o_orderstatus"),
          round(col("__ex50"), 2).as("median_exact"),
          (abs(col("__ap50") - col("__ex50")) <= col("__ex50") * lit(0.02) &&
            abs(col("__ap90") - col("__ex90")) <= col("__ex90") * lit(0.02)).as("within_band"))
        .orderBy(col("o_orderstatus")),
    Some("""SELECT o_orderstatus, round(quantile_cont(o_totalprice, 0.5), 2) AS median_exact,
      TRUE AS within_band
      FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus"""))

  /** F5 completion: zip_with, sequence, flatten, array set ops, position,
    * repeat, descending sort. Set-op results are compared by SIZE (Spark
    * pins first-occurrence order in array_intersect/except; DuckDB's
    * list_distinct does not guarantee one), element lists by concat_ws.
    * The sign arrays make set members exact ints — no float equality. */
  val t29b = GQuery(
    "t29b_array_ops",
    (s, dir) => {
      val v = VectorOps.asDouble(col("embedding"))
      // deci-bucketed ints from two disjoint vector halves: exact set
      // members (no float equality), genuinely different sets per row
      val buckets = (c: org.apache.spark.sql.Column) =>
        transform(c, x => floor(x * 10).cast("int"))
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"), v.as("v"))
        .withColumn("ai", buckets(slice(col("v"), 1, 8)))
        .withColumn("bi", buckets(slice(col("v"), 9, 8)))
        .select(
          col("vec_id"),
          round(aggregate(
            zip_with(slice(col("v"), 1, 3), slice(col("v"), 4, 3), (x, y) => x * y),
            lit(0.0), (a, x) => a + x), 6).as("zp3"),
          concat_ws(",", transform(flatten(array(slice(col("ai"), 1, 2), slice(col("ai"), 3, 2))),
            x => x.cast("string"))).as("flat4"),
          aggregate(sequence(lit(1), col("label") + 1), lit(0L), (a, x) => a + x).as("seq_sum"),
          size(array_intersect(col("ai"), col("bi"))).as("n_inter"),
          size(array_except(col("ai"), col("bi"))).as("n_except"),
          size(array_distinct(concat(col("ai"), col("bi")))).as("n_union"),
          array_position(col("ai"), 1).as("first_pos1"),
          concat_ws(",", transform(array_repeat(col("label"), 3), x => x.cast("string"))).as("rep3"),
          concat_ws(",", transform(slice(sort_array(col("ai"), asc = false), 1, 5),
            x => x.cast("string"))).as("top5_desc"))
        .orderBy(col("vec_id"))
        .limit(100)
    },
    Some("""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
      a AS (SELECT vec_id, label, v,
              list_transform(v[1:8], x -> CAST(floor(x * 10) AS INT)) AS ai,
              list_transform(v[9:16], x -> CAST(floor(x * 10) AS INT)) AS bi
            FROM e)
      SELECT vec_id,
        round(list_reduce(list_transform(generate_series(1, 3), i -> v[i] * v[i+3]),
          (x, y) -> x + y), 6) AS zp3,
        array_to_string(flatten([ai[1:2], ai[3:4]]), ',') AS flat4,
        CAST(list_reduce(generate_series(1, label + 1), (x, y) -> x + y) AS BIGINT) AS seq_sum,
        CAST(len(list_filter(list_distinct(ai), x -> list_contains(bi, x))) AS INTEGER) AS n_inter,
        CAST(len(list_filter(list_distinct(ai), x -> NOT list_contains(bi, x))) AS INTEGER) AS n_except,
        CAST(len(list_distinct(list_concat(ai, bi))) AS INTEGER) AS n_union,
        CAST(coalesce(list_position(ai, 1), 0) AS BIGINT) AS first_pos1,
        array_to_string(list_transform(generate_series(1, 3), i -> label), ',') AS rep3,
        array_to_string(list_sort(ai, 'DESC')[1:5], ',') AS top5_desc
      FROM a ORDER BY vec_id LIMIT 100"""))

  /** F6 MAP functions over REAL data (closing the "test-only" gap): a
    * map<string,bigint> column built from the events props JSON
    * (from_json), widened with a second entry (map_concat +
    * map_from_arrays), then exercised through the F6 surface —
    * element_at, map_keys (sorted to pin iteration order), size,
    * transform_values, map_filter, map_values + aggregate — all reduced
    * to SCALAR columns so the hash compare is map-layout-independent.
    * The oracle recomputes each scalar from the JSON directly (maps are
    * the Spark-side representation under test; the SEMANTICS are what
    * must match). Pure codegen projections — no shuffle beyond the
    * final order. */
  val t59map = GQuery(
    "t59_map_functions",
    (s, dir) => {
      val m = from_json(col("props"),
        org.apache.spark.sql.types.MapType(
          org.apache.spark.sql.types.StringType, org.apache.spark.sql.types.LongType))
      t(s, dir, "events")
        .withColumn("m",
          map_concat(m, map_from_arrays(array(lit("uid")), array(col("user_id")))))
        .select(
          col("event_id"),
          element_at(col("m"), "k").as("k_val"),
          element_at(col("m"), "uid").as("uid_val"),
          coalesce(element_at(col("m"), "absent"), lit(-1L)).as("missing_val"),
          size(col("m")).as("n_keys"),
          concat_ws(",", array_sort(map_keys(col("m")))).as("keys_csv"),
          element_at(transform_values(col("m"), (_, v) => v * 2L), "k").as("k_doubled"),
          size(map_filter(col("m"), (_, v) => v >= 50L)).as("n_big"),
          aggregate(map_values(col("m")), lit(0L), (acc, v) => acc + v).as("sum_vals"))
        .where(col("event_id") < 100)
        .orderBy(col("event_id"))
    },
    Some("""SELECT event_id,
        CAST(props->>'$.k' AS BIGINT) AS k_val,
        user_id AS uid_val,
        CAST(-1 AS BIGINT) AS missing_val,
        2 AS n_keys,
        'k,uid' AS keys_csv,
        CAST(props->>'$.k' AS BIGINT) * 2 AS k_doubled,
        (CASE WHEN CAST(props->>'$.k' AS BIGINT) >= 50 THEN 1 ELSE 0 END
          + CASE WHEN user_id >= 50 THEN 1 ELSE 0 END) AS n_big,
        CAST(props->>'$.k' AS BIGINT) + user_id AS sum_vals
      FROM events WHERE event_id < 100 ORDER BY event_id"""))

  /** L44 URL PARSING (F10): `parse_url` host/path/query-param extraction —
    * the column family behind domain-level corpus curation (per-domain
    * caps, blocklists, ref-tracking). The fixtures carry no URLs, so the
    * query synthesizes one per document from its own columns; the oracle
    * then computes each extracted component CONSTRUCTIVELY (host =
    * source‖'.example.com', …) — a hash match proves Spark's parser
    * recovers exactly the parts the construction injected. All per-row
    * string work is codegen'd into the scan; the rollup shuffles one row
    * per host. */
  val l44 = GQuery(
    "l44_url_parse",
    (s, dir) => {
      val url = concat(lit("https://"), col("source"), lit(".example.com/"),
        col("lang"), lit("/doc-"), col("doc_id").cast("string"),
        lit("?ref=r"), (col("doc_id") % 7).cast("string"))
      t(s, dir, "documents")
        .withColumn("u", url)
        .select(
          expr("parse_url(u, 'HOST')").as("host"),
          expr("parse_url(u, 'PATH')").as("path"),
          expr("parse_url(u, 'QUERY', 'ref')").as("ref"))
        .groupBy(col("host"))
        .agg(count(lit(1)).as("n_docs"),
          countDistinct(col("ref")).as("n_refs"),
          sum(length(col("path"))).as("sum_path_len"))
        .orderBy(col("host"))
    },
    Some("""SELECT source || '.example.com' AS host, count(*) AS n_docs,
        count(DISTINCT 'r' || CAST(doc_id % 7 AS VARCHAR)) AS n_refs,
        CAST(sum(length('/' || lang || '/doc-' || CAST(doc_id AS VARCHAR))) AS BIGINT) AS sum_path_len
      FROM documents GROUP BY 1 ORDER BY host"""))

  def all: Seq[GQuery] = Seq(t26, t26b, t26c, t26d, t26e, t27, t28, t29, t29b, t29explode,
    t16b, t16c, tUdaf, tMultimodal, tFromJson, tVariant, t59map, l44)
}
