#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle
SQL in DuckDB against the sf parquet tables and compare (rows, schema,
values) with the parquet the Verify main dumped per query.

Usage: python3 tools/local_check.py [sfDir] [outDir] [query ...]
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
only = set(sys.argv[3:])

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(os.path.join(out, "oracle_sql.json")))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            pass
    df = df.sort_values(by=list(df.columns), kind="mergesort", ignore_index=True,
                        na_position="last")
    return df

def norm_dtype(s):
    # unify timestamp flavors and int widths for schema compare
    t = str(s)
    if t.startswith("datetime64"): return "timestamp"
    return t

fails, passes, skipped = [], [], []
qnames = sorted(d for d in os.listdir(out) if os.path.isdir(os.path.join(out, d)))
for name in qnames:
    if only and name not in only: continue
    files = glob.glob(os.path.join(out, name, "*.parquet"))
    if not files:
        fails.append((name, "no parquet output")); continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if name not in oracle:
        skipped.append((name, f"rows-only: {len(got)} rows"))
        if len(got) == 0: fails.append((name, "rows-only check but 0 rows"))
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e).splitlines()[0][:200]}")); continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        fails.append((name, f"cols: got {list(g.columns)} want {list(e.columns)}")); continue
    if len(g) != len(e):
        fails.append((name, f"rows: got {len(g)} want {len(e)}")); continue
    sch_g = [norm_dtype(g[c].dtype) for c in g.columns]
    sch_e = [norm_dtype(e[c].dtype) for c in e.columns]
    bad = None
    for c in g.columns:
        gv, ev = g[c].values, e[c].values
        if gv.dtype.kind == 'f' or (hasattr(ev, 'dtype') and ev.dtype.kind == 'f'):
            gn = pd.isna(g[c].values); en = pd.isna(e[c].values)
            if not (gn == en).all(): bad = (c, "null mask"); break
            if not np.array_equal(np.asarray(gv, dtype=float)[~gn],
                                  np.asarray(ev, dtype=float)[~en]):
                idx = np.where(np.asarray(gv, dtype=float)[~gn] !=
                               np.asarray(ev, dtype=float)[~en])[0][:3]
                bad = (c, f"float diff at {idx}: got "
                       f"{np.asarray(gv,dtype=float)[~gn][idx]} want "
                       f"{np.asarray(ev,dtype=float)[~en][idx]}")
                break
        else:
            gs = g[c].astype(str).values; es = e[c].astype(str).values
            if not (gs == es).all():
                idx = np.where(gs != es)[0][:3]
                bad = (c, f"diff at {idx}: got {gs[idx]} want {es[idx]}"); break
    if bad:
        fails.append((name, f"col {bad[0]}: {bad[1]}"))
    else:
        note = "" if sch_g == sch_e else f" [dtype note: {list(zip(g.columns, sch_g, sch_e))}]"
        passes.append((name, f"{len(g)} rows{note}"))

print(f"== PASS {len(passes)} / FAIL {len(fails)} / rows-only {len(skipped)} ==")
for n, m in passes: print(f"  PASS {n}: {m}")
for n, m in skipped: print(f"  ROWS-ONLY {n}: {m}")
for n, m in fails: print(f"  FAIL {n}: {m}")
sys.exit(1 if fails else 0)
