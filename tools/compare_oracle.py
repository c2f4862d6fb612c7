#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf tables, compare with the Spark-written parquet.
Columns sorted by name; rows compared in order; floats exact + tolerant
report. Usage: compare_oracle.py <sfDir> <verifyOut>
"""
import sys, json, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name in sorted(oracles):
    if not os.path.isdir(f"{out}/{name}"):
        fails.append(name)
        print(f"{name:24s} MISSING OUTPUT (query failed?)")
for name in sorted(os.listdir(out)):
    d = f"{out}/{name}"
    if not os.path.isdir(d):
        continue
    spark = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    if name not in oracles:
        status = f"rows-only rows={len(spark)}"
        if len(spark) == 0:
            fails.append(name); status += "  <-- EMPTY"
        print(f"{name:24s} {status}")
        continue
    try:
        oracle = con.sql(oracles[name]).df()
    except Exception as e:
        fails.append(name)
        print(f"{name:24s} ORACLE SQL ERROR: {e}")
        continue
    spark = spark[sorted(spark.columns)]
    oracle = oracle[sorted(oracle.columns)]
    if list(spark.columns) != list(oracle.columns):
        fails.append(name)
        print(f"{name:24s} COLUMN MISMATCH spark={list(spark.columns)} oracle={list(oracle.columns)}")
        continue
    if len(spark) != len(oracle):
        fails.append(name)
        print(f"{name:24s} ROWCOUNT spark={len(spark)} oracle={len(oracle)}")
        continue
    bad = []
    for c in spark.columns:
        a, b = spark[c], oracle[c]
        if str(a.dtype) != str(b.dtype):
            # The driver's hash is value-repr-typed: a DuckDB HUGEINT
            # (float64 in pandas, repr "92.0") vs Spark BIGINT ("92")
            # fails there even when every value is equal, while a benign
            # same-kind width difference (int32 vs int64) passes. Match
            # that: fail on KIND mismatch, warn + coerce on width.
            if a.dtype.kind != b.dtype.kind:
                bad.append(f"{c}: DTYPE {a.dtype} vs {b.dtype} (cast the oracle, e.g. CAST(sum(..) AS BIGINT))")
                continue
            print(f"{name:24s} note: {c} width {a.dtype} vs {b.dtype} (driver accepts)")
            b = b.astype(a.dtype)
        if a.dtype.kind == 'f':
            import numpy as np
            neq = ~(np.isclose(a, b, rtol=0, atol=1e-9) | (a.isna() & b.isna()))
        else:
            neq = ~((a == b) | (a.isna() & b.isna()))
        if neq.any():
            i = neq.idxmax()
            bad.append(f"{c}: {int(neq.sum())} diffs, first@{i}: {a[i]!r} vs {b[i]!r}")
    if bad:
        fails.append(name)
        print(f"{name:24s} VALUE DIFFS: " + "; ".join(bad[:3]))
    else:
        print(f"{name:24s} OK rows={len(spark)}")
print()
print(f"FAILED: {fails}" if fails else "ALL OK")
sys.exit(1 if fails else 0)
