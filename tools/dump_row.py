#!/usr/bin/env python3
"""Row-level divergence dump for a named query: print BOTH engines' rows.

When a driver CORRECTNESS row goes hash-red with rows+schema green, the
record alone doesn't say WHICH value differs.  This tool re-runs the
DuckDB oracle from the Verify output's oracle_sql.json, loads the Spark
parquet for the same query, aligns columns by sorted name, and prints:

  - duckdb version + platform (the usual suspect for divergence)
  - per-column dtype pairs
  - POSITIONAL diffs first (the driver/check.py contract: rows are
    compared in order), then canonical (row-sorted) diffs — a query
    that is positional-red but canonical-equal is a ROW-ORDER-ONLY
    divergence (an ORDER BY that is not a total order, or a
    collation difference), which needs a tie-break column, not a
    value fix

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


def canon(df, row_sort=True):
    df = df[sorted(df.columns)]
    if row_sort:
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def diff_rows(s, o, n, label):
    diffs = 0
    for i in range(max(len(s), len(o))):
        if i >= len(s):
            print(f"{label} row {i}: spark=<missing> "
                  f"oracle={o.iloc[i].to_dict()}")
            diffs += 1
        elif i >= len(o):
            print(f"{label} row {i}: spark={s.iloc[i].to_dict()} "
                  f"oracle=<missing>")
            diffs += 1
        else:
            sr, orow = s.iloc[i], o.iloc[i]
            cols = [c for c in s.columns if str(sr[c]) != str(orow[c])]
            if cols:
                diffs += 1
                print(f"{label} row {i}: differs on {cols}")
                print(f"  spark : {sr.to_dict()}")
                print(f"  oracle: {orow.to_dict()}")
        if diffs >= n:
            print(f"... stopping after {n} {label} diffs")
            break
    return diffs


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
    sp, op = canon(s, row_sort=False), canon(o, row_sort=False)
    sc, oc = canon(s), canon(o)
    print(f"# spark rows={len(sp)} cols={list(sp.columns)}")
    print(f"# oracle rows={len(op)} cols={list(op.columns)}")
    for c in sorted(set(sp.columns) | set(op.columns)):
        sd = str(sp[c].dtype) if c in sp.columns else "<absent>"
        od = str(op[c].dtype) if c in op.columns else "<absent>"
        flag = "" if sd == od else "   <-- dtype differs"
        print(f"#   {c}: spark={sd} oracle={od}{flag}")
    if list(sp.columns) != list(op.columns):
        print("SCHEMA-DIFF: column sets differ, stopping"); sys.exit(1)
    pos = diff_rows(sp, op, n, "positional")
    can = diff_rows(sc, oc, n, "canonical") if pos else 0
    if pos == 0:
        print("ALL-EQUAL (positional string-compare, the checker's view)")
    elif can == 0:
        print(f"ROW-ORDER-ONLY divergence: {pos} positional diffs but "
              "canonical row sets match — fix the ORDER BY tie-break, "
              "not the values")
    sys.exit(0 if pos == 0 else 1)


if __name__ == "__main__":
    main()
