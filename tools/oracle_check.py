#!/usr/bin/env python3
"""Local twin of the driver's correctness gate: run each oracleSql in DuckDB
over the sf tables and compare against the parquet written by graft.Verify.
Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    def norm(v):
        if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
            return tuple(norm(x) for x in v)
        if isinstance(v, float):
            return round(v, 9)
        if type(v).__name__ in ("Decimal",):
            return float(v)
        if isinstance(v, pd.Timestamp):
            return v.tz_localize(None) if v.tzinfo else v
        return v
    return df.map(norm)

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
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append((name, f"schema: spark={list(a.columns)} duck={list(b.columns)}"))
        continue
    if len(a) != len(b):
        fails.append((name, f"rows: spark={len(a)} duck={len(b)}"))
        continue
    eq = a.reset_index(drop=True).astype(str).equals(b.reset_index(drop=True).astype(str))
    if not eq:
        diff_i = None
        av, bv = a.reset_index(drop=True).astype(str), b.reset_index(drop=True).astype(str)
        for i in range(len(av)):
            if not av.iloc[i].equals(bv.iloc[i]):
                diff_i = i
                break
        fails.append((name, f"values differ, first at row {diff_i}:\n  spark={av.iloc[diff_i].to_dict() if diff_i is not None else '?'}\n  duck ={bv.iloc[diff_i].to_dict() if diff_i is not None else '?'}"))
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
