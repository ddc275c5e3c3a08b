#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run Verify output
against DuckDB oracles. Usage: check_oracle.py <sfDir> <outDir>"""
import sys, json, glob, duckdb, pandas as pd, numpy as np

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
ok = fail = 0
for name in sorted(oracle):
    try:
        got = pd.read_parquet(f"{out}/{name}")
        exp = con.sql(oracle[name]).df()
        got = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
        exp = exp[sorted(exp.columns)].sort_values(sorted(exp.columns)).reset_index(drop=True)
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}"); fail += 1; continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}"); fail += 1; continue
        bad = None
        for c in got.columns:
            g, e = got[c].values, exp[c].values
            if g.dtype.kind == 'f' or e.dtype.kind == 'f':
                # equal_nan: nullable BIGINT columns arrive as float
                # with NaN for NULL; NaN == NaN must count as equal
                eq = np.array_equal(g.astype('f8'), e.astype('f8'),
                                    equal_nan=True)
            else:
                eq = (pd.Series(g).astype(str) == pd.Series(e).astype(str)).all()
            if not eq:
                bad = c
                m = (pd.Series(g).astype(str) != pd.Series(e).astype(str))
                i = int(np.argmax(m.values))
                print(f"FAIL {name}: col {c} first diff at row {i}: got={g[i]!r} exp={e[i]!r}")
                break
        if bad: fail += 1
        else: ok += 1; print(f"OK   {name} ({len(got)} rows)")
    except Exception as ex:
        print(f"ERR  {name}: {str(ex)[:200]}"); fail += 1
print(f"\n{ok} ok, {fail} fail")
sys.exit(1 if fail else 0)
