#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate: load Verify's parquet
dumps, run each oracle SQL in DuckDB over the same sf tables, compare
(columns sorted by name, values hashed). Usage:
  python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    pdir = f"{outdir}/{name}"
    files = glob.glob(f"{pdir}/*.parquet")
    if not files:
        print(f"MISSING  {name}: no parquet output"); fail += 1; continue
    try:
        got = pd.read_parquet(pdir).reindex(sorted(pd.read_parquet(pdir).columns), axis=1)
        want = con.execute(sql).df()
        want = want.reindex(sorted(want.columns), axis=1)
    except Exception as e:
        print(f"ERROR    {name}: {e}"); fail += 1; continue
    if list(got.columns) != list(want.columns):
        print(f"SCHEMA   {name}: got {list(got.columns)} want {list(want.columns)}"); fail += 1; continue
    if len(got) != len(want):
        print(f"ROWS     {name}: got {len(got)} want {len(want)}"); fail += 1; continue
    # normalize types for value compare
    mismatch = None
    for c in got.columns:
        g, w = got[c], want[c]
        try:
            if str(g.dtype).startswith("datetime") or str(w.dtype).startswith("datetime"):
                g = pd.to_datetime(g).astype("int64")
                w = pd.to_datetime(w).astype("int64")
            if g.dtype != w.dtype:
                g = g.astype("object"); w = w.astype("object")
            eq = (g.reset_index(drop=True) == w.reset_index(drop=True)) | (g.isna().reset_index(drop=True) & w.isna().reset_index(drop=True))
            if not eq.all():
                i = eq[~eq].index[0]
                mismatch = f"col {c} row {i}: got {got[c].iloc[i]!r} want {want[c].iloc[i]!r}"
                break
        except Exception as e:
            mismatch = f"col {c}: compare error {e}"; break
    if mismatch:
        print(f"VALUES   {name}: {mismatch}"); fail += 1
    else:
        print(f"OK       {name} ({len(got)} rows)"); ok += 1
print(f"\n{ok} ok, {fail} failed")
sys.exit(1 if fail else 0)
