#!/usr/bin/env python3
"""Local oracle check mimicking the driver: run Verify output vs DuckDB.

Usage: python3 tools/check.py <verify_out_dir> <sf_dir> [query ...]
"""
import json, sys, glob, os
import duckdb
import pandas as pd

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    fails = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not spark_files:
            print(f"{name}: MISSING spark output"); fails += 1; continue
        s = pd.read_parquet(spark_files[0]) if len(spark_files) == 1 else \
            pd.concat([pd.read_parquet(f) for f in spark_files])
        try:
            o = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE ERR {e}"); fails += 1; continue
        s = s[sorted(s.columns)].reset_index(drop=True)
        o = o[sorted(o.columns)].reset_index(drop=True)
        ok_rows = len(s) == len(o)
        ok_schema = list(s.columns) == list(o.columns)
        ok_vals = False
        if ok_rows and ok_schema:
            ok_vals = True
            for c in s.columns:
                sv, ov = s[c], o[c]
                try:
                    ov2 = ov.astype(sv.dtype)
                except Exception:
                    ov2 = ov
                eq = (sv == ov2) | (sv.isna() & ov2.isna())
                if not eq.all():
                    ok_vals = False
                    bad = (~eq).idxmax()
                    print(f"  {name}.{c}: first mismatch row {bad}: "
                          f"spark={sv[bad]!r} oracle={ov2[bad]!r}")
        status = "PASS" if (ok_rows and ok_schema and ok_vals) else \
            f"FAIL rows={ok_rows}({len(s)}/{len(o)}) schema={ok_schema} vals={ok_vals}"
        if not status.startswith("PASS"):
            fails += 1
            if not ok_schema:
                print(f"  {name} cols: spark={list(s.columns)} oracle={list(o.columns)}")
        print(f"{name}: {status}")
    sys.exit(1 if fails else 0)

main()
