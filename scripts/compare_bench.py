#!/usr/bin/env python3
"""Compare two bench_out-schema JSON artifacts and flag superlinear
scaling suspects. Used for the sf0.1 -> sf1 (10x) sweep: a query over
THRESHOLD x (default 15x) for 10x data without a documented quadratic
contract is an investigation target — this instrument caught the
round-11 d_bbit_minhash pair-source drift.

Usage: python3 scripts/compare_bench.py <base.json> <scaled.json> [threshold]
"""
import json
import sys

base = json.load(open(sys.argv[1]))
scaled = json.load(open(sys.argv[2]))
threshold = float(sys.argv[3]) if len(sys.argv) > 3 else 15.0

ratio_total = scaled["value"] / base["value"] if base["value"] else float("nan")
print(f"base total {base['value']}s | scaled total {scaled['value']}s "
      f"({ratio_total:.1f}x) | scaled errors {scaled['errors']}")
print(f"scaled canary: {scaled['canary']}")

rows = []
for q, t1 in scaled["queries"].items():
    t0 = base["queries"].get(q)
    if t0 is None:
        continue
    # sub-100ms base points are noise-floor; ratios from them lie
    rows.append((t1 / max(t0, 0.1), q, t0, t1))
rows.sort(reverse=True)

print(f"\nworst ratios (scaled / max(base, 0.1s)); > {threshold}x flagged:")
for r, q, t0, t1 in rows[:25]:
    flag = " <<<" if r > threshold else ""
    print(f"{q:28s} {t0:7.2f}s -> {t1:8.2f}s  {r:6.1f}x{flag}")
over = [q for r, q, *_ in rows if r > threshold]
print(f"\n{len(over)} over {threshold}x: {over}")
if rows:
    print(f"median ratio: {sorted(r for r, *_ in rows)[len(rows)//2]:.2f}")
else:
    print("no common query names between the two artifacts — nothing compared")
