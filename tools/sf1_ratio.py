#!/usr/bin/env python3
"""Scale-proof ratio check (dev tooling): compares a sf1 BENCH_full run
against the sf0.1 fresh-JVM reconciliation run and flags queries whose
sf0.1 -> sf1 cost ratio exceeds the superlinearity threshold (default
12x for 10x data — headroom over linear for shuffle constants, sort
log-factors and fixed overheads measured on cheap queries).

Usage: python3 tools/sf1_ratio.py BENCH_sf1.json BENCH_sf01.json [threshold]
"""
import json
import sys

sf1 = json.load(open(sys.argv[1]))["queries"]
sf01 = json.load(open(sys.argv[2]))["queries"]
thr = float(sys.argv[3]) if len(sys.argv) > 3 else 12.0

common = sorted(set(sf1) & set(sf01))
if not common or sum(sf01[q] for q in common) == 0:
    print(f"no comparable queries ({len(common)} common, sf0.1 total 0) — "
          "check the BENCH files belong to the same surface")
    sys.exit(1)
rows = []
for q in common:
    a, b = sf01[q], sf1[q]
    # sub-100ms sf0.1 numbers are all fixed overhead; ratios on them are
    # noise, but still flag if the sf1 side got genuinely expensive
    ratio = b / a if a > 0 else float("inf")
    rows.append((q, a, b, ratio))

rows.sort(key=lambda r: -r[3])
flagged = [r for r in rows if r[3] > thr and r[2] > 1.0]
print(f"common queries: {len(common)}; total sf0.1 {sum(r[1] for r in rows):.1f}s "
      f"-> sf1 {sum(r[2] for r in rows):.1f}s "
      f"(aggregate ratio {sum(r[2] for r in rows)/sum(r[1] for r in rows):.2f}x)")
print(f"flagged (> {thr}x AND sf1 > 1s): {len(flagged)}")
for q, a, b, r in flagged:
    print(f"  {q}: {a:.3f}s -> {b:.3f}s  ({r:.1f}x)")
print("top 15 ratios (all):")
for q, a, b, r in rows[:15]:
    print(f"  {q}: {a:.3f}s -> {b:.3f}s  ({r:.1f}x)")
