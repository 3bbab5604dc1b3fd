#!/usr/bin/env python3
"""Estimate-regime verification for the sketch queries at sf1.

At sf0.01/sf0.1 the theta-sketch queries run below k=4096 distinct
values, where KMV is EXACT and the COUNT(DISTINCT) oracle hash-matches.
sf1 pushes NDV past k, so the sketch answers are estimates BY DESIGN —
a hash mismatch there is the estimator working, not a wrong result.
This check asserts the honest contract instead: every estimated row is
within 3 standard errors of the exact count (KMV RSE ≈ 1/sqrt(k)), and
rows still in the exact regime (NDV <= k) match exactly.

    python3 tools/check_sf1_sketches.py [/tmp/sf1 /tmp/verify_sf1]
"""
import sys, glob, json, os
import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(__file__))
from check_oracle import connect_views, canon

K = 4096
RSE = 1.0 / K ** 0.5
QUERIES = ["q_theta", "q_theta_setops", "q_rollup_reagg", "q_segment_compact",
           "q_tuple_sketch"]
# columns that are sketch ESTIMATES despite a non-float dtype (the
# tuple-sketch query casts its count/sum estimates to long; its means
# are floats but ride the same 3-sigma band)
EXTRA_EST_COLS = {
    "q_tuple_sketch": {"n_users", "sum_units", "n_rows",
                       "mean_units", "mean_rows"},
}
# regime indicator per query: the column whose EXACT value decides
# whether the sketch sampled (NDV > K) — counts/sums then ride the
# 3-sigma RSE band; without it the column's own exact value decides
REGIME_COL = {"q_tuple_sketch": "n_users"}
# ToMeans columns are SAMPLE MEANS over the ~K retained keys: error is
# 3*cv/sqrt(K) of the exact mean, cv <= 1 for these metrics (uniform
# mod-97 totals: cv ~ 0.6; per-key row counts: cv ~ 0.15) -> 5% band
MEAN_COLS = {"q_tuple_sketch": {"mean_units", "mean_rows"}}
MEAN_BAND = 0.05


def main(sf_dir, out_dir):
    con = connect_views(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = 0
    for name in QUERIES:
        spark_df = canon(pd.concat(pd.read_parquet(f)
                                   for f in glob.glob(f"{out_dir}/{name}/*.parquet")))
        duck = canon(con.execute(oracle[name]).df())
        assert len(spark_df) == len(duck), f"{name}: row counts differ"
        # align rows on the NON-float key columns — canon's value sort
        # orders estimate and exact rows differently when a float column
        # sorts first, silently comparing different groups
        keys = [c for c in duck.columns
                if not pd.api.types.is_float_dtype(duck[c])
                and c not in EXTRA_EST_COLS.get(name, set())]
        if keys:
            spark_df = spark_df.sort_values(keys).reset_index(drop=True)
            duck = duck.sort_values(keys).reset_index(drop=True)
        bad = []
        n_est = 0
        # set-op results (intersection/difference) are estimates whenever
        # the UNION left the exact regime — their absolute error scales
        # with the union size, not their own magnitude, so the 3σ band is
        # 3·RSE·union (KMV theta: sub-set-op error ∝ sampled-union error)
        union_col = "either_users" if "either_users" in duck.columns else None
        extra = EXTRA_EST_COLS.get(name, set())
        for col in duck.columns:
            if not pd.api.types.is_float_dtype(duck[col]) and col not in extra:
                if not spark_df[col].astype(str).equals(duck[col].astype(str)):
                    bad.append(f"non-sketch col {col} differs")
                continue
            for i in range(len(duck)):
                exact, est = duck[col][i], spark_df[col][i]
                scale = duck[union_col][i] if union_col else exact
                regime = (duck[REGIME_COL[name]][i]
                          if name in REGIME_COL else scale)
                if name in MEAN_COLS and col in MEAN_COLS[name]:
                    n_est += 1
                    if abs(est - exact) > MEAN_BAND * abs(exact):
                        bad.append(f"{col}[{i}]: mean {est} vs exact {exact} "
                                   f"(> {MEAN_BAND:.0%} band)")
                    continue
                if regime <= K:
                    if est != exact:
                        bad.append(f"{col}[{i}]: exact-regime mismatch {est} vs {exact}")
                else:
                    n_est += 1
                    if abs(est - exact) > 3 * RSE * scale:
                        bad.append(f"{col}[{i}]: {est} vs exact {exact} "
                                   f"(err {abs(est-exact):.0f} > 3σ·scale={3*RSE*scale:.0f})")
        if bad:
            print(f"FAIL {name}: {bad[:3]}", flush=True)
        else:
            n_ok += 1
            print(f"OK   {name} ({len(duck)} rows, {n_est} estimate-regime values all within 3σ={3*RSE:.2%})", flush=True)
    print(f"== {n_ok}/{len(QUERIES)} sketch queries within estimate-regime bounds", flush=True)
    sys.exit(0 if n_ok == len(QUERIES) else 1)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1",
         sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_sf1")
