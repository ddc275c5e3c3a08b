#!/usr/bin/env python3
"""Row-level divergence dump for a named query: print BOTH engines' rows.

When a driver CORRECTNESS row goes hash-red with rows+schema green, the
record alone doesn't say WHICH value differs.  This tool re-runs the
DuckDB oracle from the Verify output's oracle_sql.json, loads the Spark
parquet for the same query, canonicalizes both exactly like the checker
(sorted column names, row-sorted by every column), and prints:

  - duckdb version + platform (the usual suspect for divergence)
  - per-column dtype pairs
  - the first N differing rows side by side (or ALL-EQUAL)

Usage: python3 tools/dump_row.py <verify_out_dir> <sf_dir> <query> [N=20]
"""
import glob
import json
import os
import platform
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def main():
    out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
    n = int(sys.argv[4]) if len(sys.argv) > 4 else 20
    print(f"# duckdb={duckdb.__version__} pandas={pd.__version__} "
          f"python={platform.python_version()} {platform.platform()}")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    if name not in oracle:
        print(f"{name}: no oracle sql"); sys.exit(2)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    spark_files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
    if not spark_files:
        print(f"{name}: MISSING spark output under {out_dir}"); sys.exit(2)
    s = pd.concat([pd.read_parquet(f) for f in spark_files]) \
        if len(spark_files) > 1 else pd.read_parquet(spark_files[0])
    o = con.execute(oracle[name]).df()
    s, o = canon(s), canon(o)
    print(f"# spark rows={len(s)} cols={list(s.columns)}")
    print(f"# oracle rows={len(o)} cols={list(o.columns)}")
    for c in sorted(set(s.columns) | set(o.columns)):
        sd = str(s[c].dtype) if c in s.columns else "<absent>"
        od = str(o[c].dtype) if c in o.columns else "<absent>"
        flag = "" if sd == od else "   <-- dtype differs"
        print(f"#   {c}: spark={sd} oracle={od}{flag}")
    if list(s.columns) != list(o.columns):
        print("SCHEMA-DIFF: column sets differ, stopping"); sys.exit(1)
    diffs = 0
    for i in range(max(len(s), len(o))):
        if i >= len(s):
            print(f"row {i}: spark=<missing> oracle={o.iloc[i].to_dict()}")
            diffs += 1
        elif i >= len(o):
            print(f"row {i}: spark={s.iloc[i].to_dict()} oracle=<missing>")
            diffs += 1
        else:
            sr, orow = s.iloc[i], o.iloc[i]
            cols = [c for c in s.columns
                    if str(sr[c]) != str(orow[c])]
            if cols:
                diffs += 1
                print(f"row {i}: differs on {cols}")
                print(f"  spark : {sr.to_dict()}")
                print(f"  oracle: {orow.to_dict()}")
        if diffs >= n:
            print(f"... stopping after {n} diffs")
            break
    if diffs == 0:
        print("ALL-EQUAL (string-compare over canonical rows)")
    sys.exit(0 if diffs == 0 else 1)


if __name__ == "__main__":
    main()
