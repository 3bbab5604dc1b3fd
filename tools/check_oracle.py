#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs each SparkEntry.oracleSql in DuckDB over the same parquet tables,
loads the Spark result parquet written by graft.Verify, sorts columns by
name and rows by value, and compares. Usage:

    python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, math
import duckdb
import pandas as pd

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

def connect_views(sf_dir):
    """DuckDB connection with one view per test table. Handles both the
    driver's single-file tables and Spark's directory output (scaled
    data dirs)."""
    import os
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        # partial SF dirs (e.g. a docs+embeddings-only sf10 ladder dir)
        # get views only for the tables they carry — a mirror touching
        # a missing table then fails on the missing VIEW, loudly
        if not os.path.exists(p):
            continue
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # normalize timestamps to naive UTC strings for robust compare
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def compare(name, spark_df, duck_df, tol=1e-9):
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWCOUNT MISMATCH spark={len(a)} oracle={len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            av = pd.to_numeric(av, errors="coerce")
            bv = pd.to_numeric(bv, errors="coerce")
            bad = ~((av.isna() & bv.isna()) |
                    (abs(av - bv) <= tol * (1 + abs(bv))))
            if bad.any():
                i = bad.idxmax()
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
            # exact-hash check the driver likely does: flag any non-identical float
            exact_bad = ~((av.isna() & bv.isna()) | (av == bv))
            if exact_bad.any():
                i = exact_bad.idxmax()
                print(f"  [warn] {name}: float not bit-identical col={c} row={i} "
                      f"spark={av[i]!r} oracle={bv[i]!r}")
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = neq.idxmax()
                return f"VALUE MISMATCH col={c} row={i} spark={av[i]!r} oracle={bv[i]!r}"
    return None

def main(sf_dir, out_dir):
    con = connect_views(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        try:
            duck_df = con.execute(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}"); continue
        err = compare(name, spark_df, duck_df)
        if err: print(f"FAIL {name}: {err}")
        else: n_ok += 1; print(f"OK   {name} ({len(duck_df)} rows)")
    print(f"== {n_ok}/{len(oracle)} matched")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
