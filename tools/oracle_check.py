#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Dev tool only (driver-side python deps) — the shipped Scala library never
imports this. Usage: python3 tools/oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, os
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(os.listdir(outdir)):
    p = os.path.join(outdir, name)
    if not os.path.isdir(p):
        continue
    spark_df = con.execute(
        f"SELECT * FROM '{p}/*.parquet'").df()
    if name not in oracle:
        print(f"{name:32s} NO-ORACLE rows={len(spark_df)}")
        continue
    duck_df = con.execute(oracle[name]).df()
    # driver semantics: sort columns by name, then hash values
    a = spark_df[sorted(spark_df.columns)]
    b = duck_df[sorted(duck_df.columns)]
    status = []
    if list(a.columns) != list(b.columns):
        status.append(f"SCHEMA {list(a.columns)} vs {list(b.columns)}")
    elif len(a) != len(b):
        status.append(f"ROWS {len(a)} vs {len(b)}")
    else:
        # row-order-insensitive compare: sort rows by all columns
        ka = a.sort_values(by=list(a.columns), kind="mergesort").reset_index(drop=True)
        kb = b.sort_values(by=list(b.columns), kind="mergesort").reset_index(drop=True)
        for c in a.columns:
            va, vb = ka[c], kb[c]
            try:
                diffs = (va.astype(str) != vb.astype(str))
                if diffs.any():
                    i = diffs.idxmax()
                    status.append(f"COL {c} row{i}: {va[i]!r} vs {vb[i]!r}")
                    break
            except Exception as e:
                status.append(f"COL {c} compare error: {e}")
                break
    if status:
        fails += 1
        print(f"{name:32s} FAIL {'; '.join(status)}")
    else:
        print(f"{name:32s} OK   rows={len(a)}")
print(f"\n{fails} failures")
sys.exit(1 if fails else 0)
