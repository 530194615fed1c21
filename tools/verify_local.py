#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run graft.Verify at a
given SF, then replay each oracleSql query in DuckDB over the same parquet
tables and compare values (columns sorted by name, row order as produced).

Usage: tools/verify_local.py [sfDir] [outDir] [--skip-run] [queryFilter]
"""
import json
import math
import os
import subprocess
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
SKIP_RUN = "--skip-run" in sys.argv
FILTER = next((a for a in sys.argv[3:] if not a.startswith("--")), None)

if not SKIP_RUN:
    env = dict(os.environ, SPARK_GRAFT_CPUS=os.environ.get("SPARK_GRAFT_CPUS", "8"))
    subprocess.run(
        ["/root/repo/tools/run_main.sh", "graft.Verify", SF_DIR, OUT_DIR],
        check=True, env=env,
    )

con = duckdb.connect()
for f in sorted(os.listdir(SF_DIR)):
    if f.endswith(".parquet"):
        name = f[: -len(".parquet")]
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{f}')"
        )

with open(f"{OUT_DIR}/oracle_sql.json") as fh:
    oracle = json.load(fh)


def normalize(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # repr round-trips doubles exactly AND distinguishes -0.0 from 0.0
        # (python == treats them equal, the driver's hash does not — the
        # r7 q20d escape); bit-level compare mimics the driver faithfully
        return repr(v)
    if hasattr(v, "isoformat"):
        return v.isoformat()[:26]
    if isinstance(v, bytes):
        return v.hex()
    return v


def rows_of(cols, data):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(normalize(r[i]) for i in order) for r in data]


fails, passes, weak = [], 0, []
for name in sorted(os.listdir(OUT_DIR)):
    path = os.path.join(OUT_DIR, name)
    if not os.path.isdir(path):
        continue
    if FILTER and FILTER not in name:
        continue
    rel = con.sql(f"SELECT * FROM read_parquet('{path}/*.parquet')")
    spark_cols, spark_rows = rel.columns, rel.fetchall()
    if name not in oracle:
        weak.append((name, len(spark_rows)))
        continue
    try:
        o = con.sql(oracle[name])
        o_cols, o_rows = o.columns, o.fetchall()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    a, b = rows_of(spark_cols, spark_rows), rows_of(o_cols, o_rows)
    if sorted(spark_cols) != sorted(o_cols):
        fails.append((name, f"columns differ: spark={sorted(spark_cols)} oracle={sorted(o_cols)}"))
    elif len(a) != len(b):
        fails.append((name, f"row count: spark={len(a)} oracle={len(b)}"))
    elif a != b:
        diff = next(i for i, (x, y) in enumerate(zip(a, b)) if x != y)
        fails.append((name, f"first diff at row {diff}:\n  spark : {a[diff]}\n  oracle: {b[diff]}"))
    else:
        passes += 1

print(f"\n=== {passes} PASS, {len(fails)} FAIL, {len(weak)} rows-only ===")
for name, nrows in weak:
    tag = "OK" if nrows > 0 else "EMPTY!"
    print(f"  [rows-only] {name}: {nrows} rows {tag}")
for name, msg in fails:
    print(f"  [FAIL] {name}: {msg}")
sys.exit(1 if fails else 0)
