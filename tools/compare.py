#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir> [key1,key2,...]

An optional third argument restricts the compare to those oracle keys
(the SPARK_GRAFT_ONLY iteration loop's counterpart).

Reads each <outDir>/<name> parquet result, runs the matching oracle
SQL from <outDir>/oracle_sql.json in DuckDB against <sfDir>/*.parquet
tables, sorts columns by name and rows by all columns, and diffs.
"""
import json, sys, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
con = duckdb.connect()
# spill outside the repo (a cwd .tmp/ once ballooned git history)
con.sql("SET temp_directory='/tmp/duckdb_spill'")
for t in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(t).replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{t}'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracles.items()):
    if only is not None and name not in only:
        continue
    res_dir = f"{out_dir}/{name}"
    if not os.path.isdir(res_dir):
        print(f"[{name}] MISSING spark result"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        print(f"[{name}] ORACLE ERROR: {e}"); fails += 1; continue
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        print(f"[{name}] SCHEMA MISMATCH spark={list(got.columns)} oracle={list(want.columns)}")
        fails += 1; continue
    if len(got) != len(want):
        print(f"[{name}] ROWCOUNT MISMATCH spark={len(got)} oracle={len(want)}")
        fails += 1; continue
    gs = got.sort_values(by=list(got.columns), ignore_index=True)
    ws = want.sort_values(by=list(want.columns), ignore_index=True)
    # normalize types for compare (timestamps → str, floats kept exact)
    import pandas as pd
    diff_cols = []
    for c in gs.columns:
        a, b = gs[c], ws[c]
        try:
            eq = (a.astype(str) == b.astype(str)).all()
        except Exception:
            eq = False
        if not eq:
            diff_cols.append(c)
    if diff_cols:
        print(f"[{name}] VALUE MISMATCH in cols {diff_cols}")
        for c in diff_cols[:2]:
            m = gs[c].astype(str) != ws[c].astype(str)
            print("  spark:", gs[m][c].head(3).tolist(), " oracle:", ws[m][c].head(3).tolist())
        fails += 1
    else:
        print(f"[{name}] OK ({len(got)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
