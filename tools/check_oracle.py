#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle_sql.json
query in DuckDB against the sf parquet tables and diff it against the
Verify-dumped parquet, mimicking the driver's column-name sort + value hash.

Usage: check_oracle.py <sfdir> <verify_outdir> [query ...]
"""
import sys, json, glob, os
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))

con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype.kind in "if":
            df[c] = s.astype("float64").round(6)
        else:
            df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)

fails = []
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    spark_files = glob.glob(os.path.join(outdir, name, "*.parquet"))
    if not spark_files:
        print(f"{name:28s} NO SPARK OUTPUT"); fails.append(name); continue
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name:28s} ORACLE ERROR: {e}"); fails.append(name); continue
    sdf = pd.concat([pd.read_parquet(f) for f in spark_files])
    a, b = canon(sdf), canon(odf)
    if list(a.columns) != list(b.columns):
        print(f"{name:28s} SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        fails.append(name); continue
    if len(a) != len(b):
        print(f"{name:28s} ROWS MISMATCH spark={len(a)} oracle={len(b)}")
        fails.append(name); continue
    if not a.equals(b):
        diff = (a != b).any(axis=1)
        print(f"{name:28s} VALUE MISMATCH ({int(diff.sum())} rows); first:")
        idx = diff[diff].index[:3]
        for i in idx:
            print("  spark :", dict(a.loc[i]))
            print("  oracle:", dict(b.loc[i]))
        fails.append(name); continue
    print(f"{name:28s} OK ({len(a)} rows)")

print(f"\n{'FAIL: ' + ', '.join(fails) if fails else 'ALL OK'}")
sys.exit(1 if fails else 0)
