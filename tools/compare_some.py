#!/usr/bin/env python3
"""Targeted oracle check for the optimization rounds: run graft.Verify for a
comma-separated subset of queries, then diff ONLY those against DuckDB —
the same canon/values logic as compare.py, scoped so a single changed
operator can be re-gated in ~1 minute instead of a full-gate run.

Usage: python3 tools/compare_some.py <sfdir> <q1,q2,...> [--skip-verify]

Exit 0 iff every named query passes. Full-gate compare.py remains the
round's authoritative check; this is the inner-loop tool.
"""
import json, math, os, subprocess, sys
from pathlib import Path

import duckdb
import pandas as pd

SF = sys.argv[1]
NAMES = sys.argv[2].split(",")
OUT = Path(os.environ.get("GRAFT_SOME_OUT", "/tmp/verify_some"))
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

if "--skip-verify" not in sys.argv:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT} {sys.argv[2]}'],
        cwd="/root/repo", capture_output=True, text=True, timeout=1800)
    if r.returncode != 0:
        print("VERIFY FAILED:\n", "\n".join((r.stdout + r.stderr).splitlines()[-30:]))
        sys.exit(1)
    for line in (r.stdout + r.stderr).splitlines():
        if "[verify]" in line:
            print(line)

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

oracle = json.loads((OUT / "oracle_sql.json").read_text())

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def values_equal(a, b) -> bool:
    if a is b:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    if isinstance(a, (list, tuple)) or str(type(a)).find("ndarray") >= 0:
        la, lb = list(a), list(b)
        return len(la) == len(lb) and all(values_equal(x, y) for x, y in zip(la, lb))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    return a == b

n_fail = 0
for name in NAMES:
    spark_dir = OUT / name
    if not spark_dir.is_dir():
        print(f"FAIL {name}: no spark output"); n_fail += 1; continue
    try:
        sdf = pd.read_parquet(spark_dir)
    except Exception as e:
        print(f"FAIL {name}: unreadable spark output: {e}"); n_fail += 1; continue
    if name not in oracle:
        print(f"ROWS {name}: rows={len(sdf)} (rows-only check)")
        continue
    try:
        odf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {str(e).splitlines()[0][:200]}"); n_fail += 1; continue
    sdf, odf = canon(sdf), canon(odf)
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: columns spark={list(sdf.columns)} oracle={list(odf.columns)}")
        n_fail += 1; continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rowcount spark={len(sdf)} oracle={len(odf)}")
        n_fail += 1; continue
    dtype_bad = None
    for c in sdf.columns:
        si = pd.api.types.is_integer_dtype(sdf[c])
        oi = pd.api.types.is_integer_dtype(odf[c])
        sf_ = pd.api.types.is_float_dtype(sdf[c])
        of_ = pd.api.types.is_float_dtype(odf[c])
        if (si and of_) or (sf_ and oi):
            dtype_bad = (c, sdf[c].dtype, odf[c].dtype); break
    if dtype_bad:
        print(f"FAIL {name}: dtype {dtype_bad}"); n_fail += 1; continue
    # positional compare, exactly like compare.py: every query ends in a
    # total orderBy, so row order is part of the contract
    bad = None
    for c in sdf.columns:
        sv, ov = sdf[c].tolist(), odf[c].tolist()
        for i, (a, b) in enumerate(zip(sv, ov)):
            if not values_equal(a, b):
                bad = (c, i, a, b); break
        if bad:
            break
    if bad:
        c, i, a, b = bad
        print(f"FAIL {name}: col={c} row={i} spark={a!r} oracle={b!r}")
        n_fail += 1
    else:
        print(f"PASS {name}: rows={len(sdf)}")

sys.exit(1 if n_fail else 0)
