#!/usr/bin/env python3
"""Local driver-mimic correctness check (NOT part of the library).

Usage: python3 tools/check.py [sfDir] [outDir]

Mimics the driver's t2 loop: assumes `graft.Verify` has already written
outDir/<name>/ parquet + outDir/oracle_sql.json, then runs each oracle SQL in
DuckDB over the same sfDir tables and compares values (columns sorted by
name, rows sorted by all columns, exact equality).
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
try:
    spec_oracle = json.load(open(f"{out}/spec_oracle.json"))
except FileNotFoundError:
    spec_oracle = {}

def canon(df: pd.DataFrame) -> pd.DataFrame:
    import datetime
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            # normalize tz + date-vs-midnight-timestamp representation noise
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v:
                pd.Timestamp(v) if isinstance(v, (datetime.date, datetime.datetime)) else
                tuple(v) if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray" else v)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = 0
rows_only = 0
written = {n for n in os.listdir(out) if os.path.isdir(os.path.join(out, n))}
for name in sorted(set(oracle) - written):
    print(f"[FAIL-missing] {name}: oracle declared but no result written")
    fails += 1
for name in sorted(written):
    d = os.path.join(out, name)
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        print(f"[FAIL-empty] {name}: no parquet written")
        fails += 1
        continue
    got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
    if name not in oracle:
        if len(got) == 0:
            fails += 1
            print(f"[oracle-less ROWS=0 FAIL] {name}: 0 rows")
        elif name in spec_oracle:
            rows_only += 1
            print(f"[no_oracle_by_design OK] {name}: {len(got)} rows — {spec_oracle[name]}")
        else:
            rows_only += 1
            print(f"[oracle-less rows>0 OK] {name}: {len(got)} rows (NO spec provenance — add to SparkEntry.specOracle)")
        continue
    try:
        exp = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"[FAIL-sql] {name}: {e}")
        fails += 1
        continue
    g, e = canon(got), canon(exp)
    if list(g.columns) != list(e.columns):
        print(f"[FAIL-cols] {name}: spark={list(g.columns)} duck={list(e.columns)}")
        fails += 1
        continue
    if len(g) != len(e):
        print(f"[FAIL-rows] {name}: spark={len(g)} duck={len(e)}")
        fails += 1
        continue
    diffs = []
    for c in g.columns:
        a, b = g[c], e[c]
        try:
            eq = (a.values == b.values) | (a.isna().values & b.isna().values)
        except Exception:
            eq = a.astype(str).values == b.astype(str).values
        if not eq.all():
            idx = (~eq).nonzero()[0][:3]
            diffs.append((c, [(a.iloc[i], b.iloc[i]) for i in idx]))
    if diffs:
        print(f"[FAIL-vals] {name}: {diffs}")
        fails += 1
    else:
        print(f"[OK] {name}: {len(g)} rows x {len(g.columns)} cols exact match")

print(f"\n{'PASS' if fails == 0 else 'FAIL'}: {fails} failures, {rows_only} rows-only keys")
sys.exit(1 if fails else 0)
