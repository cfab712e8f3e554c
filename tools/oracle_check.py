#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run each oracleSql in DuckDB
over the sf tables and compare against the parquet written by graft.Verify.

Deliberately mimics the driver's strictness (learned from round 1):
 - sorts the frame with DataFrame.sort_values over ALL columns, which
   raises on list/ndarray cells -> queries must not emit array columns;
 - no Decimal->float or tz normalization: a Spark DECIMAL(28,4) vs DuckDB
   DECIMAL(38,4), or tz-aware vs naive timestamp, fails the value compare
   the same way the driver's hash does.

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(df: pd.DataFrame):
    df = df.reindex(sorted(df.columns), axis=1)
    # driver-style: sort by every column (raises TypeError on array cells)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True).astype(str)


fails, passes, skips = [], [], []
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    files = glob.glob(f"{d}/*.parquet")
    if not files:
        fails.append((name, "no spark output parquet"))
        continue
    spark_df = pq.read_table(files[0]).to_pandas()
    if name not in oracle:
        skips.append((name, f"rows={len(spark_df)} (no oracle)"))
        continue
    try:
        duck_df = con.execute(oracle[name]).df()
    except Exception as e:
        fails.append((name, f"oracle SQL error: {e}"))
        continue
    try:
        a, b = canon(spark_df), canon(duck_df)
    except Exception as e:
        fails.append((name, f"comparator error (driver would hash-fail): {e}"))
        continue
    if list(a.columns) != list(b.columns):
        fails.append((name, f"schema: spark={list(a.columns)} duck={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"rows: spark={len(a)} duck={len(b)}"))
        continue
    if not a.equals(b):
        diff_i = None
        for i in range(len(a)):
            if not a.iloc[i].equals(b.iloc[i]):
                diff_i = i
                break
        fails.append(
            (name,
             f"values differ, first at sorted row {diff_i}:\n"
             f"  spark={a.iloc[diff_i].to_dict() if diff_i is not None else '?'}\n"
             f"  duck ={b.iloc[diff_i].to_dict() if diff_i is not None else '?'}"))
    else:
        passes.append((name, len(a)))

print(f"PASS {len(passes)} | FAIL {len(fails)} | NO-ORACLE {len(skips)}")
for n, r in passes:
    print(f"  ok       {n} ({r} rows)")
for n, r in skips:
    print(f"  no-oracle {n} {r}")
for n, r in fails:
    print(f"  FAIL     {n}: {r}")
sys.exit(1 if fails else 0)
