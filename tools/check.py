#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check.py <sfDir> <outDir>
  (run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)

For each query: read outDir/<name> parquet (Spark result), run
oracle_sql.json[<name>] in DuckDB with every fixture table registered
as a view, sort columns by name, sort rows, compare values exactly.
"""
import json, math, sys
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def norm(v):
    # Type-sensitive on purpose: the driver comparator hashes pandas
    # dtypes, so int64 5 != float64 5.0 (DuckDB HUGEINT sums surface as
    # float64/object). Tag every scalar with its Python type so this
    # replica fails exactly where the driver would.
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, float):
        if math.isnan(v):
            return ("float", "NaN")
        return ("float", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, list):
        # The driver's pandas sort_values crashes on ndarray cells
        # (unhashable) — flag array columns loudly instead of comparing.
        return ("ARRAY_COLUMN_WOULD_CRASH_DRIVER", tuple(norm(x) for x in v))
    if hasattr(v, "isoformat"):
        return ("ts", v.isoformat())
    if isinstance(v, dict):
        return ("struct", tuple(sorted((k, norm(x)) for k, x in v.items())))
    return (type(v).__name__, v)

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    out.sort(key=lambda t: tuple((x is None, str(type(x)), str(x)) for x in t))
    return [cols[i] for i in order], out

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        try:
            got_rel = con.sql(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = list(got_rel.columns)
            got_types = [str(t) for t in got_rel.types]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        try:
            exp_rel = con.sql(sql)
            exp_cols = list(exp_rel.columns)
            exp_types = [str(t) for t in exp_rel.types]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            continue
        # Declared-type checks (not value sampling): the driver's pandas
        # comparator crashes on LIST cells (unhashable ndarray) and
        # dtype-mismatches HUGEINT/DECIMAL oracle sums (float64/object)
        # against Spark's int64 even when every value is equal.
        bad_types = [
            f"{side}.{c}:{t}"
            for side, cols, types in (("spark", got_cols, got_types),
                                      ("oracle", exp_cols, exp_types))
            for c, t in zip(cols, types)
            if t.endswith("[]") or t.startswith("HUGEINT")
            or t.startswith("DECIMAL")]
        if bad_types:
            print(f"FAIL {name}: driver-hostile column types {bad_types} — "
                  "stringify arrays (array_join/to_json vs array_to_string)"
                  " and CAST sums AS BIGINT on the oracle side")
            continue
        gc, gr = canon(got_cols, got)
        ec, er = canon(exp_cols, exp)
        if gc != ec:
            print(f"FAIL {name}: schema {gc} != {ec}")
            continue
        if len(gr) != len(er):
            print(f"FAIL {name}: rows {len(gr)} != {len(er)}")
            continue
        bad = None
        for i, (a, b) in enumerate(zip(gr, er)):
            if a != b:
                bad = (i, a, b)
                break
        if bad:
            print(f"FAIL {name}: first diff row {bad[0]}:\n  spark={bad[1]}\n  duck ={bad[2]}")
            continue
        n_ok += 1
        print(f"OK   {name} ({len(gr)} rows)")
    print(f"== {n_ok}/{len(oracle)} match")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
