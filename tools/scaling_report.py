#!/usr/bin/env python3
"""Per-query scaling analysis between two bench_full.json artifacts.

The scale-proof story (VERDICT round 5, "Next round #1") needs more than a
green gate at sf1 — it needs evidence that runtimes scale ~linearly with
data volume. This joins two Bench full-map artifacts (e.g. sf0.1 and sf1,
10x apart), computes the per-query ratio, and prints a markdown table of
the worst scalers plus summary percentiles.

Interpreting the ratio at 10x data on a fixed local[N] box:
  * ratio <= ~3: sub-linear — fixed scheduling/plan overhead dominates at
    the small end; the query is nowhere near data-bound yet.
  * ratio ~3-10: linear-ish — data-bound; this is the expected regime for
    scans/joins/aggs once per-query fixed cost is amortized.
  * ratio > 10 (worse than the data growth): super-linear — a candidate
    for a plan audit (quadratic candidate growth, spill cliff, skew).

Usage: python3 tools/scaling_report.py bench_small.json bench_big.json [factor=10]
"""
import json
import sys


def main():
    small_path, big_path = sys.argv[1], sys.argv[2]
    factor = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    small = json.load(open(small_path))["full_queries"]
    big = json.load(open(big_path))["full_queries"]
    common = sorted(set(small) & set(big))
    rows = []
    for name in common:
        a, b = small[name], big[name]
        # guard tiny denominators: a 40ms query's ratio is all noise
        ratio = b / max(a, 0.05)
        rows.append((ratio, name, a, b))
    rows.sort(reverse=True)
    ratios = sorted(r for r, _, _, _ in rows)

    def pct(p):
        return ratios[min(len(ratios) - 1, int(p * len(ratios)))]

    print(f"queries={len(common)}  data-factor={factor:g}x  "
          f"time-ratio p50={pct(.5):.2f} p90={pct(.9):.2f} "
          f"p99={pct(.99):.2f} max={ratios[-1]:.2f}")
    total_a = sum(a for _, _, a, _ in rows)
    total_b = sum(b for _, _, _, b in rows)
    print(f"suite total: {total_a:.1f}s -> {total_b:.1f}s "
          f"(ratio {total_b / total_a:.2f} at {factor:g}x data)\n")
    print("| query | small (s) | big (s) | ratio |")
    print("|---|---|---|---|")
    for ratio, name, a, b in rows[:25]:
        flag = " **super-linear**" if ratio > factor else ""
        print(f"| {name} | {a:.3f} | {b:.3f} | {ratio:.2f}{flag} |")
    n_bad = sum(1 for r, _, _, _ in rows if r > factor)
    print(f"\nsuper-linear (> {factor:g}x time at {factor:g}x data): {n_bad}")


if __name__ == "__main__":
    main()
