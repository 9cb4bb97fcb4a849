#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Usage: python3 scripts/check.py <outDir> <sfDir>
  where <outDir> was produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`.

For each query parquet in outDir, runs the matching oracle SQL from
oracle_sql.json in DuckDB (tables = parquet files in sfDir), then
compares: row count, sorted-column-name schema, and a value hash over
rows sorted by all columns. Mirrors the driver contract described in
the builder prompt (columns sorted by name before hashing).
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np
import hashlib

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for hashing
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype('int64')
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype('float64')
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype('int64')
    df = df.sort_values(by=list(df.columns), kind='mergesort').reset_index(drop=True)
    return df

def h(df: pd.DataFrame) -> str:
    # full precision (%.17g round-trips any float64) — stricter than the
    # driver can possibly be, so local OK implies driver OK
    return hashlib.md5(df.to_csv(index=False, float_format='%.17g').encode()).hexdigest()

def dtypes_of(df: pd.DataFrame):
    return [str(t) for t in df.dtypes]

def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip('/'))
        got = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{qdir}/*.parquet")], ignore_index=True) \
            if glob.glob(f"{qdir}/*.parquet") else None
        if got is None:
            results[name] = "NO_OUTPUT"; continue
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(got)}"
            continue
        try:
            exp = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR: {e}"; continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            results[name] = f"SCHEMA_MISMATCH got={list(g.columns)} exp={list(e.columns)}"
        elif dtypes_of(g) != dtypes_of(e):
            results[name] = f"DTYPE_MISMATCH got={dtypes_of(g)} exp={dtypes_of(e)}"
        elif len(g) != len(e):
            results[name] = f"ROWCOUNT_MISMATCH got={len(g)} exp={len(e)}"
        elif h(g) != h(e):
            diff = (g != e)
            ndiff = int(diff.any(axis=1).sum())
            # show first differing rows
            idx = diff.any(axis=1)
            sample = ""
            if ndiff:
                i = idx.idxmax()
                sample = f" first_diff_row={i} got={g.iloc[i].to_dict()} exp={e.iloc[i].to_dict()}"
            results[name] = f"HASH_MISMATCH rows={len(g)} ndiff={ndiff}{sample}"
        else:
            results[name] = f"OK rows={len(g)}"
    ok = sum(1 for v in results.values() if v.startswith("OK"))
    for k, v in sorted(results.items()):
        print(f"{'PASS' if v.startswith('OK') else 'INFO' if v.startswith('ROWS_ONLY') else 'FAIL'} {k}: {v}")
    print(f"== {ok}/{len(results)} hash-match, "
          f"{sum(1 for v in results.values() if v.startswith('ROWS_ONLY'))} rows-only")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
