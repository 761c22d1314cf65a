#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run each oracle_sql.json
entry in DuckDB over the fixture tables and compare against the parquet
dumped by graft.Verify (columns sorted by name, exact values).

Usage: python3 tools/check.py [sfDir] [outDir]
(run `sbt "runMain graft.Verify <sfDir> <outDir>"` first)
"""
import glob, json, sys

import duckdb
import pandas as pd
import numpy as np

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

import os
if os.path.exists(f"{OUT}/_partial.json"):
    only = json.load(open(f"{OUT}/_partial.json")).get("only", [])
    print(f"NOTE: PARTIAL dump ({len(only)} queries: {', '.join(only[:8])}"
          f"{', …' if len(only) > 8 else ''}) — green here is NOT full coverage")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fail = 0
try:
    verrs = json.load(open(f"{OUT}/verify_errors.json"))
except FileNotFoundError:
    verrs = {}
for name, msg in sorted(verrs.items()):
    print(f"FAIL {name}: spark query threw: {msg[:200]}")
    fail += 1
for name, sql in sorted(oracle.items()):
    try:
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fail += 1
        continue
    files = glob.glob(f"{OUT}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fail += 1
        continue
    got = pd.read_parquet(f"{OUT}/{name}")
    want = want[sorted(want.columns)]
    got = got[sorted(got.columns)]
    if list(want.columns) != list(got.columns):
        print(f"FAIL {name}: columns want={list(want.columns)} got={list(got.columns)}")
        fail += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {name}: rows want={len(want)} got={len(got)}")
        fail += 1
        continue
    # dtype gate, mirroring the driver's real check (this script previously
    # compared values only — an int32-vs-int64 mismatch passed locally and
    # failed the round): ints of different widths are a FAIL, float64 must
    # match float64, object/string compares loosely.
    dtype_bad = [
        f"{c}: want={want[c].dtype} got={got[c].dtype}"
        for c in want.columns
        if want[c].dtype != got[c].dtype
        and not (want[c].dtype.kind == "O" and got[c].dtype.kind == "O")
    ]
    if dtype_bad:
        print(f"FAIL {name}: dtypes differ: {'; '.join(dtype_bad)}")
        fail += 1
        continue
    bad = []
    for c in want.columns:
        w, g = want[c].values, got[c].values
        if w.dtype.kind == "f" or g.dtype.kind == "f":
            eq = (pd.isna(w) & pd.isna(g)) | (w == g)
        else:
            eq = (pd.isna(w) & pd.isna(g)) | (pd.Series(w).eq(pd.Series(g)).values)
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f"{c}[row {i}]: want={w[i]!r} got={g[i]!r} "
                       f"(dtypes {w.dtype}/{g.dtype}, {int((~eq).sum())} diffs)")
    if bad:
        print(f"FAIL {name}: " + "; ".join(bad[:3]))
        fail += 1
    else:
        print(f"OK   {name} ({len(want)} rows)")

# Sortability smoke over EVERY dumped query, oracle or not: the driver's
# harness does pandas sort_values over all columns before hashing, which
# crashes on unhashable cells (array/struct) — round 8's x106 erred exactly
# there, invisible to this script because rows-only queries were skipped
# entirely. Mirror the driver's exact operation so an unsortable column goes
# red locally first.
import os
dumped = sorted(d for d in os.listdir(OUT)
                if os.path.isdir(f"{OUT}/{d}") and glob.glob(f"{OUT}/{d}/*.parquet"))
rowsonly = [d for d in dumped if d not in oracle]
for name in dumped:
    try:
        df = pd.read_parquet(f"{OUT}/{name}")
        df.sort_values(by=list(df.columns), inplace=False)
    except Exception as e:
        print(f"FAIL {name}: driver-style sort_values would crash: {type(e).__name__}: {e}")
        fail += 1
        continue
    if name in rowsonly:
        print(f"ROWS {name} ({len(df)} rows, no oracle — rows-only)")
print(f"{'ALL OK' if fail == 0 else f'{fail} FAILURES'} / "
      f"{len(oracle)} oracle + {len(rowsonly)} rows-only queries")
sys.exit(1 if fail else 0)
