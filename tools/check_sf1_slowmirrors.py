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

# q_dedup_edit: pairs cannot cross copies (token-disjoint copies have
# Jaccard 0), and the _c<i> token suffix CHANGES byte edit distances
# (each inserted token costs |suffix| more), so copy images are NOT
# isomorphic and the structure check can't cover copies 1..9 — the
# unchanged mirror restricted to one whole copy's documents is the
# exact verification for that copy's rows. Copy 0 is covered by
# equality with the DuckDB-verified sf0.1 run (check_sf1_structure).
EDIT_COPIES = [(25000, 30000)]  # copy 5 (one full copy ≈ the sf0.1 mirror cost)


def main(sf_dir, out_dir):
    con = connect_views(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    sql = oracle["q_doc_fingerprint"]
    spark_df = pd.concat(pd.read_parquet(f)
                         for f in glob.glob(f"{out_dir}/q_doc_fingerprint/*.parquet"))
    marker = "WHERE length(text) >= 8"
    assert marker in sql, "mirror changed — update the slice injection"
    n_ok, n_all = 0, len(SLICES)
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

    if "q_dedup_edit" in oracle:
        esql = oracle["q_dedup_edit"]
        emarker = "string_split(text, ' ') words FROM documents)"
        assert emarker in esql, "edit mirror changed — update the slice injection"
        e_spark = pd.concat(pd.read_parquet(f)
                            for f in glob.glob(f"{out_dir}/q_dedup_edit/*.parquet"))
        for lo, hi in EDIT_COPIES:
            n_all += 1
            sliced = esql.replace(
                emarker,
                emarker[:-1] + f" WHERE doc_id >= {lo} AND doc_id < {hi})")
            t0 = time.time()
            duck = con.execute(sliced).df()
            sp = e_spark[(e_spark.a_id >= lo) & (e_spark.a_id < hi)]
            err = compare(f"q_dedup_edit[{lo},{hi})", sp, duck)
            if err:
                print(f"FAIL q_dedup_edit[{lo},{hi}): {err}", flush=True)
            else:
                n_ok += 1
                print(f"OK   q_dedup_edit[{lo},{hi}) ({len(duck)} rows) [{time.time()-t0:.1f}s]", flush=True)

    print(f"== {n_ok}/{n_all} slices matched", flush=True)
    sys.exit(0 if n_ok == n_all else 1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1")
