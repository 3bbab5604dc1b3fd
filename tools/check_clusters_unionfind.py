#!/usr/bin/env python3
"""Independent connected-components verification for q_dedup_clusters.

Dedup.clusters(threshold=0.8) builds its edge set with the SAME
minhashPairs parameters as q_dedup_minhash (shingleN=3, numHashes=64,
bandRows=2, threshold=0.8), so the cluster labels must equal
min-id connected components over exactly the q_dedup_minhash output
pairs + all document ids — computable with a trivial (obviously
correct) union-find here, independent of both Spark's star-contraction
and DuckDB's recursive CTE (whose sf0.1+ runtime is why this exists).

    python3 tools/check_clusters_unionfind.py /tmp/verify_sf01
"""
import sys, glob
import pandas as pd


def load(out, q):
    return pd.concat(pd.read_parquet(f)
                     for f in sorted(glob.glob(f"{out}/{q}/*.parquet")))


def main(out_dir):
    pairs = load(out_dir, "q_dedup_minhash")
    clusters = load(out_dir, "q_dedup_clusters")
    parent = {}

    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in zip(pairs.a_id, pairs.b_id):
        union(int(a), int(b))
    want = {int(d): find(int(d)) for d in clusters.doc_id}
    got = {int(d): int(c) for d, c in zip(clusters.doc_id, clusters.cluster_id)}
    bad = {d for d in want if want[d] != got[d]}
    n_clusters = len(set(want.values()))
    if bad:
        d = sorted(bad)[0]
        print(f"FAIL q_dedup_clusters: {len(bad)} docs mislabeled "
              f"(e.g. doc {d}: union-find {want[d]} vs spark {got[d]})")
        sys.exit(1)
    print(f"OK   q_dedup_clusters == union-find over q_dedup_minhash pairs "
          f"({len(want)} docs, {n_clusters} clusters, {len(pairs)} edges)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/verify_sf01")
