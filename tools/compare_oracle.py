#!/usr/bin/env python
"""Local pre-flight for the driver's t2 gate: run each oracle SQL in DuckDB
over the testdata parquet tables and diff against the Spark parquet dumps
produced by graft.Verify. Usage:
    python tools/compare_oracle.py /tmp/vout /root/testdata/sf0.01
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails, okс = [], 0

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            pass
        # normalize ns->us timestamps
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.reset_index(drop=True)

names = sorted(os.listdir(outdir))
for name in names:
    if name == "oracle_sql.json": continue
    path = os.path.join(outdir, name)
    if not os.path.isdir(path): continue
    spark_df = pd.concat([pd.read_parquet(f) for f in sorted(glob.glob(f"{path}/*.parquet"))],
                         ignore_index=True) if glob.glob(f"{path}/*.parquet") else pd.DataFrame()
    if name not in oracle:
        print(f"  [rows-only] {name}: {len(spark_df)} rows")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: oracle error: {e}"); continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append(name)
        print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
        continue
    if a.shape != b.shape:
        fails.append(name); print(f"FAIL {name}: shape spark={a.shape} duck={b.shape}"); continue
    dtype_mismatch = [(c, str(a[c].dtype), str(b[c].dtype)) for c in a.columns
                      if str(a[c].dtype) != str(b[c].dtype)]
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        eq = True
    except AssertionError as e:
        eq = False; err = str(e).split("\n")[0:6]
    if eq:
        okс += 1
        note = f" (dtype diff: {dtype_mismatch})" if dtype_mismatch else ""
        print(f"  ok {name}: {len(a)} rows{note}")
    else:
        fails.append(name)
        print(f"FAIL {name}: values differ: {err}")

print(f"\n{okс} ok, {len(fails)} failed: {fails}")
sys.exit(1 if fails else 0)
