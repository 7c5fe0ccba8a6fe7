#!/usr/bin/env python3
"""Local dev check that mimics the driver's DuckDB-oracle compare:
run each oracle SQL in DuckDB over the sf parquet tables, load the
Spark result parquet, sort columns by name + rows, and diff values.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    p = f"{sf_dir}/{t}.parquet"
    if os.path.isfile(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    elif os.path.isdir(p):  # Spark writes a directory of part files
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

fail, ok, rows_only = [], [], []
for name in sorted(glob.glob(f"{out_dir}/*/")):
    qname = os.path.basename(name.rstrip("/"))
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{name}/*.parquet")],
                         ignore_index=True) if glob.glob(f"{name}/*.parquet") else pd.DataFrame()
    if qname not in oracle:
        rows_only.append((qname, len(spark_df)))
        continue
    try:
        oracle_df = con.execute(oracle[qname]).fetchdf()
    except Exception as e:
        fail.append((qname, f"oracle SQL error: {e}"))
        continue
    a, b = canon(spark_df), canon(oracle_df)
    if list(a.columns) != list(b.columns):
        fail.append((qname, f"schema: spark={list(a.columns)} oracle={list(b.columns)}"))
        continue
    # the driver's gate hashes VALUES WITH TYPES: an int64 Spark column vs a
    # DuckDB HUGEINT-materialized-as-float64 oracle column fails its hash even
    # when every value is numerically identical — and per round-5 adjudication
    # int32 vs int64 fails it too, so require exact dtype equality for
    # numeric columns (object columns are stringified by canon)
    # datetime64 resolution (ns from parquet vs us from DuckDB) is
    # normalized by the driver's hash (q_gap_fill was green in r05)
    dt_bad = [c for c in a.columns
              if a[c].dtype != b[c].dtype
              and not (a[c].dtype == object and b[c].dtype == object)
              and not (a[c].dtype.kind == "M" and b[c].dtype.kind == "M")]
    if dt_bad:
        fail.append((qname, "dtype: " + ", ".join(
            f"{c} spark={a[c].dtype} oracle={b[c].dtype}" for c in dt_bad)))
        continue
    if len(a) != len(b):
        fail.append((qname, f"rows: spark={len(a)} oracle={len(b)}"))
        continue
    mismatch = None
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            bad = ~(np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9) |
                    (pd.isna(av) & pd.isna(bv)))
        else:
            bad = ~((av == bv) | (pd.isna(av) & pd.isna(bv)))
        if bad.any():
            i = int(np.argmax(bad))
            mismatch = f"col {c}: row{i} spark={av[i]!r} oracle={bv[i]!r} ({int(bad.sum())} bad)"
            break
    if mismatch: fail.append((qname, mismatch))
    else: ok.append(qname)

print(f"OK ({len(ok)}):", " ".join(ok))
print(f"ROWS-ONLY ({len(rows_only)}):", " ".join(f"{q}={n}" for q, n in rows_only))
print(f"FAIL ({len(fail)}):")
for q, m in fail: print(f"  {q}: {m}")
sys.exit(1 if fail else 0)
