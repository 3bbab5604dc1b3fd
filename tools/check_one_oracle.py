#!/usr/bin/env python3
"""Run ONE query's DuckDB mirror with no time budget (for the mirrors
that are slow-but-feasible at a given SF).

    python3 -u tools/check_one_oracle.py <sf_dir> <out_dir> <query>
"""
import sys, glob, json, os, time
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import connect_views, compare


def main(sf_dir, out_dir, name):
    con = connect_views(sf_dir)
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
    spark_df = pd.concat(pd.read_parquet(f)
                         for f in glob.glob(f"{out_dir}/{name}/*.parquet"))
    t0 = time.time()
    duck = con.execute(sql).df()
    err = compare(name, spark_df, duck)
    dt = time.time() - t0
    if err:
        print(f"FAIL {name}: {err} [{dt:.1f}s]", flush=True)
        sys.exit(1)
    print(f"OK   {name} ({len(duck)} rows) [{dt:.1f}s]", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2], sys.argv[3])
