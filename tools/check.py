#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate: run every
SparkEntry.oracleSql in DuckDB over the same parquet tables and diff against
the Spark results dumped by graft.Verify.

Usage: python3 tools/check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
ok, bad, noracle = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    spark = pd.concat([pd.read_parquet(f) for f in files]) if files else pd.DataFrame()
    if name not in oracle:
        noracle.append((name, len(spark)))
        continue
    try:
        duck = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        bad.append((name, f"oracle SQL error: {e}"))
        continue
    s = spark[sorted(spark.columns)].reset_index(drop=True)
    q = duck[sorted(duck.columns)].reset_index(drop=True)
    if list(s.columns) != list(q.columns):
        bad.append((name, f"columns spark={list(s.columns)} duck={list(q.columns)}"))
        continue
    if len(s) != len(q):
        bad.append((name, f"rows spark={len(s)} duck={len(q)}"))
        continue
    diffs = []
    for c in s.columns:
        a, b = s[c], q[c]
        try:
            eq = (a.astype(str) == b.astype(str))
        except Exception:
            eq = a == b
        if not eq.all():
            i = (~eq).idxmax()
            diffs.append(f"{c}[row {i}]: spark={a[i]!r} duck={b[i]!r} "
                         f"({(~eq).sum()} mismatches)")
    if diffs:
        bad.append((name, "; ".join(diffs)))
    else:
        ok.append((name, len(s)))

print(f"== OK ({len(ok)}):")
for n, r in ok:
    print(f"   {n}: {r} rows")
print(f"== NO-ORACLE ({len(noracle)}):")
for n, r in noracle:
    print(f"   {n}: {r} rows")
print(f"== MISMATCH ({len(bad)}):")
for n, msg in bad:
    print(f"   {n}: {msg[:500]}")
sys.exit(1 if bad else 0)
