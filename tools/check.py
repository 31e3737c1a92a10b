#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 tools/check.py <sfDir> <verifyOutDir> [query ...]

Reads each <outDir>/<name> parquet (written by graft.Verify), runs the
matching oracle SQL from <outDir>/oracle_sql.json in DuckDB over the
same fixture tables, canonicalizes both sides (columns sorted by name,
rows sorted, doubles rounded to 6dp) and compares. 6dp matches the
driver's hash precision: every query that emits floats rounds them
in-query to 4 or 6dp (the determinism rule), so canonicalizing any
coarser than 6dp would green-light divergences the driver's hash
catches (this exact gap hid the round-4 l12b failure at 2dp).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == np.float64 or df[c].dtype == np.float32:
            df[c] = df[c].astype(np.float64).round(6) + 0.0  # +0.0 kills -0.0
        # decimals / objects: stringify for stable compare
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"create view {t} as select * from read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_skip = 0
    for res_dir in sorted(glob.glob(f"{out_dir}/*")):
        name = os.path.basename(res_dir)
        if not os.path.isdir(res_dir): continue
        if only and name not in only: continue
        spark_df = pd.concat([pd.read_parquet(p) for p in
                              glob.glob(f"{res_dir}/*.parquet")], ignore_index=True) \
            if glob.glob(f"{res_dir}/*.parquet") else pd.DataFrame()
        if name not in oracles:
            print(f"SKIP  {name:24s} rows={len(spark_df)} (no oracle)")
            n_skip += 1
            continue
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        except Exception as e:
            print(f"FAIL  {name:24s} oracle error: {str(e)[:200]}")
            n_fail += 1
            continue
        a, b = canon(spark_df), canon(duck_df)
        if list(a.columns) != list(b.columns):
            print(f"FAIL  {name:24s} columns spark={list(a.columns)} duck={list(b.columns)}")
            n_fail += 1
            continue
        if len(a) != len(b):
            print(f"FAIL  {name:24s} rows spark={len(a)} duck={len(b)}")
            n_fail += 1
            continue
        try:
            eq = a.equals(b)
            if not eq:
                # tolerate dtype mismatch: compare as strings
                eq = a.astype(str).equals(b.astype(str))
        except Exception:
            eq = False
        if eq:
            print(f"PASS  {name:24s} rows={len(a)}")
            n_pass += 1
        else:
            print(f"FAIL  {name:24s} value mismatch (rows={len(a)})")
            diff = (a.astype(str) != b.astype(str))
            rows = diff.any(axis=1)
            idx = list(a.index[rows])[:3]
            for i in idx:
                print(f"      spark: {a.loc[i].to_dict()}")
                print(f"      duck : {b.loc[i].to_dict()}")
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail, {n_skip} rows-only")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
