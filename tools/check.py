#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle correctness gate.

Usage: tools/check.py [sf_dir] [verify_out_dir]

Reads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf tables,
loads the Spark parquet result, sorts columns by name (driver behavior),
and compares values exactly (plus a row-sorted comparison to distinguish
order-only mismatches).
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    # pandas nulls
    try:
        an, bn = pd.isna(a), pd.isna(b)
        if isinstance(an, bool) and isinstance(bn, bool) and (an or bn):
            return an and bn
    except Exception:
        pass
    return a == b

def df_eq(a, b):
    if list(a.columns) != list(b.columns) or len(a) != len(b):
        return False
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for x, y in zip(av, bv):
            if not cell_eq(x, y):
                return False
    return True

def first_diff(a, b):
    for c in a.columns:
        av, bv = a[c].tolist(), b[c].tolist()
        for i, (x, y) in enumerate(zip(av, bv)):
            if not cell_eq(x, y):
                return f"col={c} row={i}: spark={x!r} oracle={y!r}"
    return ""

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        try:
            got = canon(pd.read_parquet(f"{out}/{name}"))
            exp = canon(con.sql(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            n_fail += 1
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns spark={list(got.columns)} oracle={list(exp.columns)}")
            n_fail += 1
        elif len(got) != len(exp):
            print(f"FAIL {name}: rows spark={len(got)} oracle={len(exp)}")
            n_fail += 1
        elif df_eq(got, exp):
            print(f"PASS {name} ({len(got)} rows)")
            n_pass += 1
        else:
            gs = got.sort_values(by=list(got.columns)).reset_index(drop=True)
            es = exp.sort_values(by=list(exp.columns)).reset_index(drop=True)
            if df_eq(gs, es):
                print(f"WARN {name}: values match but row ORDER differs")
                n_fail += 1
            else:
                print(f"FAIL {name}: {first_diff(got, exp)}")
                n_fail += 1
    # queries without an oracle: rows-only check (driver's weaker check)
    import os
    for d in sorted(glob.glob(f"{out}/*/")):
        name = os.path.basename(d.rstrip("/"))
        if name in oracle:
            continue
        try:
            n = len(pd.read_parquet(d))
            status = "PASS" if n > 0 else "FAIL"
            print(f"{status} {name} (rows-only: {n} rows)")
            if n > 0:
                n_pass += 1
            else:
                n_fail += 1
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
