#!/usr/bin/env python3
"""check_oracle with per-query wall timing + a per-query timeout, for
scaled-data runs where individual DuckDB mirrors can be slow. Prints
incrementally (unbuffered-friendly); queries exceeding the per-query
budget are reported SLOW and skipped, not silently lost.

    python3 -u tools/check_oracle_timed.py <sf_dir> <out_dir> [per_query_timeout_sec]
"""
import json, sys, glob, os, time, multiprocessing as mp

sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import connect_views, compare  # reuse the exact gate logic

import duckdb
import pandas as pd


def run_oracle(sf_dir, sql, q):
    con = connect_views(sf_dir)
    try:
        q.put(("ok", con.execute(sql).df()))
    except Exception as e:
        q.put(("err", str(e)))


def main(sf_dir, out_dir, per_query_timeout=600):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok, slow, failed = 0, [], []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output", flush=True)
            failed.append(name)
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        t0 = time.time()
        q = mp.Queue()
        proc = mp.Process(target=run_oracle, args=(sf_dir, sql, q))
        proc.start()
        # q.get BEFORE join: a large result blocks the child's queue
        # write until the parent reads — join-first deadlocks on any
        # output bigger than the pipe buffer
        try:
            status, payload = q.get(timeout=per_query_timeout)
        except Exception:
            proc.terminate()
            proc.join()
            print(f"SLOW {name}: oracle exceeded {per_query_timeout}s (spark side: {len(spark_df)} rows)", flush=True)
            slow.append(name)
            continue
        proc.join(60)
        dt = time.time() - t0
        if status == "err":
            print(f"FAIL {name}: oracle SQL error: {payload}", flush=True)
            failed.append(name)
            continue
        err = compare(name, spark_df, payload)
        if err:
            print(f"FAIL {name}: {err} [{dt:.1f}s]", flush=True)
            failed.append(name)
        else:
            n_ok += 1
            print(f"OK   {name} ({len(payload)} rows) [{dt:.1f}s]", flush=True)
    print(f"== {n_ok}/{len(oracle)} matched, {len(slow)} slow-skipped {slow}, {len(failed)} failed {failed}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], int(sys.argv[3]) if len(sys.argv) > 3 else 600)
