#!/usr/bin/env python3
"""Compare two Bench JSON artifacts on their common queries.

Usage: compare_bench.py OLD.json NEW.json [ratio_flag_threshold]

Prints common-query totals, the uniform-drift profile (median/mean
per-query ratio, max ratio), and every query whose ratio exceeds the
flag threshold (default 2.0) — the round-9 protocol's standalone
subset comparison, scripted.
"""
import json
import statistics
import sys


def load(p):
    with open(p) as f:
        return json.load(f)


def main():
    old, new = load(sys.argv[1]), load(sys.argv[2])
    flag = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    oq, nq = old["queries"], new["queries"]
    common = sorted(set(oq) & set(nq))
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    to, tn = sum(oq[q] for q in common), sum(nq[q] for q in common)
    ratios = {q: nq[q] / oq[q] for q in common if oq[q] > 0}
    print(f"old: {sys.argv[1]}  total={old['value']:.2f}s / {len(oq)} queries")
    print(f"new: {sys.argv[2]}  total={new['value']:.2f}s / {len(nq)} queries")
    print(f"common {len(common)}: {to:.2f}s -> {tn:.2f}s = {tn/to:.3f}x")
    rs = sorted(ratios.values())
    print(f"per-query ratio: median {statistics.median(rs):.3f} "
          f"mean {statistics.mean(rs):.3f} "
          f"p90 {rs[int(0.9 * (len(rs) - 1))]:.3f} max {rs[-1]:.3f}")
    worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:8]
    print("largest ratios: " +
          ", ".join(f"{q} {r:.2f}x ({oq[q]:.2f}->{nq[q]:.2f}s)"
                    for q, r in worst))
    absd = sorted(((q, nq[q] - oq[q]) for q in common),
                  key=lambda kv: -abs(kv[1]))[:8]
    print("largest abs deltas: " +
          ", ".join(f"{q} {d:+.2f}s" for q, d in absd))
    flagged = [(q, r) for q, r in ratios.items() if r >= flag]
    print(f"queries >= {flag}x: "
          f"{sorted(flagged, key=lambda kv: -kv[1]) if flagged else 'none'}")
    if only_old:
        print(f"only in old ({len(only_old)}): {', '.join(only_old)}")
    if only_new:
        t = sum(nq[q] for q in only_new)
        print(f"only in new ({len(only_new)}, {t:.2f}s): "
              + ", ".join(f"{q} {nq[q]:.2f}s" for q in only_new))


if __name__ == "__main__":
    main()
