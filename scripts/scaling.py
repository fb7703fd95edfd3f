#!/usr/bin/env python3
"""Scaling audit: per-query wall-time ratios across scale factors.

Usage: python3 scripts/scaling.py <bench_sf0001.json> <bench_sf001.json> <bench_sf01.json>

Each input is a Bench side file (`queries` = min-of-N seconds). Data
grows 10x between adjacent scale factors, so for a query whose cost is
dominated by data (not fixed overhead), t(sf0.1)/t(sf0.01) ~ 10 means
linear scaling; >> 10 means superlinear (the 100 TB red flag); << 10
means fixed overhead still dominates at these sizes (fine).

The exponent column fits log10(t01/t001) — only meaningful when the
smaller-scale time is itself above overhead (~0.3s), so sub-overhead
rows print '-'.
"""
import json
import math
import sys


def main():
    paths = sys.argv[1:4]
    small, mid, big = (json.load(open(p))["queries"] for p in paths)
    rows = []
    for q in sorted(big):
        t001, t01, t1 = small.get(q, -1), mid.get(q, -1), big.get(q, -1)
        if min(t001, t01, t1) < 0:
            rows.append((q, t001, t01, t1, None, "FAILED"))
            continue
        ratio = t1 / t01 if t01 > 0 else float("inf")
        exp = math.log10(t1 / t01) if t01 >= 0.3 else None
        flag = ""
        if t01 >= 0.3 and ratio > 14:
            flag = "SUPERLINEAR"
        elif t01 >= 0.3 and ratio > 11:
            flag = "watch"
        rows.append((q, t001, t01, t1, exp, flag))
    print(f"{'query':38s} {'sf0.001':>8s} {'sf0.01':>8s} {'sf0.1':>8s} "
          f"{'exp':>5s}  flag")
    for q, a, b, c, e, f in rows:
        es = f"{e:5.2f}" if e is not None else "    -"
        print(f"{q:38s} {a:8.3f} {b:8.3f} {c:8.3f} {es}  {f}")
    bad = [r for r in rows if r[5] == "SUPERLINEAR"]
    print(f"\n{len(rows)} queries; {len(bad)} superlinear")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
