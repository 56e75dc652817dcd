#!/usr/bin/env python3
"""Render the 100x extrapolation table for ARCHITECTURE.md from
bench_full.json (sf0.1 = 1x) + bench_scale10.json (10x).

For each 10x flagship: measured walls at both scales, the implied
scaling exponent e = log10(t10 / t1) (e = 1 is perfectly linear), the
10x max-task shuffle, and its 100x linear extrapolation. Usage:
  python3 scripts/scale_table.py
"""
import json, math, sys

full = json.load(open("bench_full.json"))
s10 = json.load(open("bench_scale10.json"))
q1 = full["queries"]
rows = []
for name, r in sorted(s10["queries"].items()):
    base = name.replace("_10x", "")
    t1 = r.get("sec_1x", q1.get(base, -1.0))
    if t1 is None or t1 <= 0:
        t1 = q1.get(base, -1.0)
    t10 = r["sec"]
    mb = r["max_task_shuffle_mb"]
    exp = math.log10(t10 / t1) if t1 and t1 > 0 else float("nan")
    rows.append((name, t1, t10, exp, mb, mb * 10))
print("| query | 1x wall s | 10x wall s | exponent | 10x max-task MB | ~100x max-task MB |")
print("|---|---|---|---|---|---|")
for name, t1, t10, exp, mb, mb100 in rows:
    t1s = f"{t1:.2f}" if t1 > 0 else "n/a"
    es = f"{exp:.2f}" if not math.isnan(exp) else "n/a"
    print(f"| {name} | {t1s} | {t10:.1f} | {es} | {mb:.1f} | {mb100:.0f} |")
