#!/usr/bin/env python3
"""Per-query scaling exponents from the 3-point spot battery (dev tooling).

Usage: python3 tools/scaling_exponents.py <spot_sf0.1.json> <spot_sf1.json> <spot_sf3.json>

Fits t ~ c * s^alpha over s in {0.1, 1, 3} (least squares in log-log) and
also reports the sf1->sf3 local exponent log(t3/t1)/log(3) — the number
that answers "is anything super-linear where it counts", since the
sf0.1 point carries a fixed-cost floor that biases the 3-point fit low.
"""
import json
import math
import sys

def load(p):
    with open(p) as f:
        return json.load(f)["queries"]

def main():
    a, b, c = (load(p) for p in sys.argv[1:4])
    scales = [0.1, 1.0, 3.0]
    print(f"{'query':<30} {'sf0.1':>8} {'sf1':>8} {'sf3':>8} {'fit_alpha':>9} {'sf1->sf3':>9}")
    rows = []
    for q in sorted(a, key=lambda q: -c.get(q, 0)):
        ts = [a.get(q), b.get(q), c.get(q)]
        if any(t is None or t <= 0 for t in ts):
            # a query missing from one file or with a non-positive timing
            # (failed / timed-out run) has no computable exponent — report
            # it instead of crashing on KeyError / log(0)
            vals = " ".join("   --   " if t is None else f"{t:8.2f}" for t in ts)
            print(f"{q:<30} {vals} {'(uncomputable)':>20}")
            continue
        xs = [math.log(s) for s in scales]
        ys = [math.log(t) for t in ts]
        n = 3
        sx, sy = sum(xs), sum(ys)
        sxx = sum(x * x for x in xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        alpha = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        local = math.log(ts[2] / ts[1]) / math.log(3.0)
        rows.append((q, ts, alpha, local))
        print(f"{q:<30} {ts[0]:>8.2f} {ts[1]:>8.2f} {ts[2]:>8.2f} {alpha:>9.2f} {local:>9.2f}")
    # total over the computable queries only, so one missing/failed entry
    # doesn't take down the summary row
    common = [q for q, _, _, _ in rows]
    tot = [sum(load(p)[q] for q in common) for p in sys.argv[1:4]]
    la = math.log(tot[2] / tot[1]) / math.log(3.0)
    print(f"{'TOTAL':<30} {tot[0]:>8.1f} {tot[1]:>8.1f} {tot[2]:>8.1f} {'':>9} {la:>9.2f}")

if __name__ == "__main__":
    main()
