#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: after `sbt "runMain graft.Verify /root/testdata/sf0.01 /tmp/graft_verify"`,
run `python3 tools/verify_local.py /root/testdata/sf0.01 /tmp/graft_verify`.

For each query dir under outDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over views named like the tables,
sort columns by name (as the driver does), and compare row-by-row.
"""
import sys, os, json, math
import duckdb

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

# DuckDB types that no Spark result can ever produce: an oracle column with
# one of these hash-splits against the driver's typed canonicalizer even when
# every VALUE matches (e.g. un-cast sum(BIGINT) -> HUGEINT). Round-8 shipped
# three such bugs; this lint makes the class impossible to re-commit.
NON_SPARK_TYPES = ("HUGEINT", "UHUGEINT", "UBIGINT", "UINTEGER",
                   "USMALLINT", "UTINYINT", "INT128", "UINT128")

# Benign cross-engine pairs the driver's canonicalizer treats as equal
# (empirically: CORRECTNESS_r08 hash-greens rank()'s BIGINT vs Spark's
# INTEGER, and lake `version` INTEGER vs BIGINT — integer WIDTH is not
# hashed, only the int-vs-int128/decimal class is).
TYPE_EQUIV = [{"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
              {"TINYINT", "SMALLINT", "INTEGER", "BIGINT"}]

def type_lint(name, s_cols, s_types, o_cols, o_types):
    """Return a list of lint failures for oracle/spark result types."""
    errs = []
    o_by_name = dict(zip(o_cols, [str(t) for t in o_types]))
    s_by_name = dict(zip(s_cols, [str(t) for t in s_types]))
    for c, ot in o_by_name.items():
        if any(bad in ot.upper() for bad in NON_SPARK_TYPES) or \
                (ot.upper().startswith("DECIMAL") and
                 not s_by_name.get(c, "").upper().startswith("DECIMAL")):
            errs.append(f"oracle column {c} has non-Spark type {ot} "
                        f"(wrap in CAST(... AS BIGINT)/matching Spark type)")
            continue
        st = s_by_name.get(c)
        if st is None or st == ot:
            continue
        if any(st in eq and ot in eq for eq in TYPE_EQUIV):
            continue
        errs.append(f"column {c} type mismatch spark={st} oracle={ot}")
    return errs

def canon(v):
    if v is None:
        return "\\N"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    return str(v)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_rowsonly = 0
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')")
            s_cols = list(spark_rel.columns)
            s_rows = spark_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: cannot read spark result: {e}")
            n_fail += 1
            continue
        if name not in oracle:
            status = "ROWS-ONLY" if len(s_rows) >= 0 else "EMPTY"
            print(f"{status:9s} {name}: {len(s_rows)} rows")
            n_rowsonly += 1
            continue
        try:
            o_rel = con.sql(oracle[name])
            o_cols = list(o_rel.columns)
            o_rows = o_rel.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: oracle error: {e}")
            n_fail += 1
            continue
        if sorted(s_cols) != sorted(o_cols):
            print(f"FAIL  {name}: schema mismatch spark={sorted(s_cols)} oracle={sorted(o_cols)}")
            n_fail += 1
            continue
        lint = type_lint(name, s_cols, spark_rel.types, o_cols, o_rel.types)
        if lint:
            print(f"FAIL  {name}: type lint: " + "; ".join(lint))
            n_fail += 1
            continue
        s_idx = [s_cols.index(c) for c in sorted(s_cols)]
        o_idx = [o_cols.index(c) for c in sorted(o_cols)]
        s_canon = [[canon(r[i]) for i in s_idx] for r in s_rows]
        o_canon = [[canon(r[i]) for i in o_idx] for r in o_rows]
        if len(s_canon) != len(o_canon):
            print(f"FAIL  {name}: row count spark={len(s_canon)} oracle={len(o_canon)}")
            n_fail += 1
            continue
        bad = [(i, a, b) for i, (a, b) in enumerate(zip(s_canon, o_canon)) if a != b]
        if bad:
            i, a, b = bad[0]
            print(f"FAIL  {name}: {len(bad)}/{len(s_canon)} rows differ; first at {i}:")
            print(f"      cols:   {sorted(s_cols)}")
            print(f"      spark:  {a}")
            print(f"      oracle: {b}")
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(s_canon)} rows")
            n_pass += 1
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only ==")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
