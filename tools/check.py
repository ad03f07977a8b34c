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
            got_rel = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')")
            got_cols = [d[0] for d in got_rel.description]
            got = got_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: spark result unreadable: {e}")
            continue
        try:
            exp_rel = con.execute(sql)
            exp_cols = [d[0] for d in exp_rel.description]
            exp = exp_rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:160]}")
            continue
        if any(isinstance(x, list) for r in got[:50] for x in r):
            print(f"FAIL {name}: array-valued output column — driver "
                  "comparator (pandas sort_values) crashes on ndarray; "
                  "stringify with array_join/to_json on both sides")
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
