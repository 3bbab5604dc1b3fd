#!/usr/bin/env python3
"""Restricted direct mirrors for the per-row-independent queries whose
full DuckDB mirrors are too slow at sf1 (the char-level winnowing FNV
CTE is ~minutes per 5k docs in SQL).

q_doc_fingerprint is one row per document with no cross-document
dependence, so running the UNCHANGED mirror on document slices and
comparing those rows is exact verification for the sliced docs. The
slices target non-copy-0 copies — copy 0 is already covered by
check_sf1_structure.py (equality with the DuckDB-verified sf0.1 run).

    python3 tools/check_sf1_slowmirrors.py [/tmp/sf1 /tmp/verify_sf1]
"""
import sys, glob, json, os, time
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import connect_views, compare

SLICES = [(7000, 7500), (25000, 25500), (45500, 46000)]  # copies 1, 5, 9


def main(sf_dir, out_dir):
    con = connect_views(sf_dir)
    sql = json.load(open(f"{out_dir}/oracle_sql.json"))["q_doc_fingerprint"]
    spark_df = pd.concat(pd.read_parquet(f)
                         for f in glob.glob(f"{out_dir}/q_doc_fingerprint/*.parquet"))
    marker = "WHERE length(text) >= 8"
    assert marker in sql, "mirror changed — update the slice injection"
    n_ok = 0
    for lo, hi in SLICES:
        sliced = sql.replace(marker, marker + f" AND doc_id >= {lo} AND doc_id < {hi}")
        t0 = time.time()
        duck = con.execute(sliced).df()
        sp = spark_df[(spark_df.doc_id >= lo) & (spark_df.doc_id < hi)]
        err = compare(f"q_doc_fingerprint[{lo},{hi})", sp, duck)
        if err:
            print(f"FAIL q_doc_fingerprint[{lo},{hi}): {err}", flush=True)
        else:
            n_ok += 1
            print(f"OK   q_doc_fingerprint[{lo},{hi}) ({len(duck)} rows) [{time.time()-t0:.1f}s]", flush=True)
    print(f"== {n_ok}/{len(SLICES)} slices matched", flush=True)
    sys.exit(0 if n_ok == len(SLICES) else 1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1")
