#!/usr/bin/env python3
"""Local stand-in for the driver's t2 check: run each oracle SQL in DuckDB
against the sf parquet tables and compare with the Verify output parquet.
Columns sorted by name; values compared exactly (with float diagnostics)."""
import sys, json, glob, os
import duckdb, pandas as pd, numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.isdir(p):  # Spark-written table = a directory of part files
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
    elif os.path.exists(p):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    else:
        continue
    if t == "events":
        # One writer shape since the r8 regeneration: events.ts is
        # TIMESTAMP (NTZ micros) everywhere. Fail fast on a stale pre-r7
        # int64-nanos instance, mirroring Registry.tbl's fail-fast.
        (ty,) = con.sql("SELECT typeof(ts) FROM events LIMIT 1").fetchone()
        assert ty != "BIGINT", \
            f"{p}: pre-r7 int64-nanos events — regenerate with graft.tools.ScaleData"

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# Optional third arg: comma-separated name prefixes — triage mode for big
# scale instances where a full DuckDB pass is hours (the O(N^2) verifier
# oracles dominate); e.g. `check_oracle.py data/sf3 out q47,q70,q99`.
only = sys.argv[3].split(',') if len(sys.argv) > 3 else None
fails, passes = [], []
for name, sql in sorted(oracle.items()):
    if only is not None and not any(name.startswith(p) for p in only):
        continue
    spark_dir = f"{outdir}/{name}"
    files = glob.glob(f"{spark_dir}/*.parquet")
    if not files:
        fails.append((name, "no spark output")); continue
    print(f"[check] {name} ...", file=sys.stderr, flush=True)
    try:
        got = con.sql(f"SELECT * FROM '{spark_dir}/*.parquet'").df()
        want = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"sql error: {e}")); continue
    got = got[sorted(got.columns)].reset_index(drop=True)
    want = want[sorted(want.columns)].reset_index(drop=True)
    if list(got.columns) != list(want.columns):
        fails.append((name, f"cols differ: spark={list(got.columns)} oracle={list(want.columns)}")); continue
    if len(got) != len(want):
        fails.append((name, f"rowcount differs: spark={len(got)} oracle={len(want)}")); continue
    ok = True
    for c in got.columns:
        a, b = got[c], want[c]
        if a.dtype.kind == 'f' or b.dtype.kind == 'f':
            aa, bb = a.astype(float), b.astype(float)
            both_nan = aa.isna() & bb.isna()
            eq = (aa == bb) | both_nan
            if not eq.all():
                d = (aa - bb).abs().max()
                fails.append((name, f"col {c}: {int((~eq).sum())} mismatches, maxdiff={d}")); ok = False
        else:
            aa, bb = a.astype(str), b.astype(str)
            eq = aa == bb
            if not eq.all():
                i = int(np.argmax(~eq.values))
                fails.append((name, f"col {c}: {int((~eq).sum())} mismatches, e.g. row {i}: spark={aa[i]!r} oracle={bb[i]!r}")); ok = False
    if ok:
        passes.append(name)

print(f"PASS {len(passes)}: {' '.join(passes)}")
print(f"FAIL {len(set(f[0] for f in fails))}:")
for n, msg in fails: print(f"  {n}: {msg}")
sys.exit(1 if fails else 0)
