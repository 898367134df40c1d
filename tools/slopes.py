#!/usr/bin/env python3
"""Compare two Bench per_query lines (e.g. sf0.1 vs a 10x replica) and
print the slope table: per-query 10x/1x ratio, sorted descending, plus
summary stats. Usage: python3 tools/slopes.py bench_1x.jsonl bench_10x.jsonl
"""
import json
import sys


def load(path):
    per = None
    for line in open(path):
        line = line.strip()
        if not line:
            continue
        try:
            obj = json.loads(line)
        except json.JSONDecodeError:
            continue
        if obj.get("metric") == "per_query":
            per = obj["queries"]
    if per is None:
        raise SystemExit(f"no per_query line in {path}")
    return per


a, b = load(sys.argv[1]), load(sys.argv[2])
common = sorted(set(a) & set(b), key=lambda q: -(b[q] / max(a[q], 1e-9)))
rows = [(q, a[q], b[q], b[q] / max(a[q], 1e-9)) for q in common]
print(f"{'query':45s} {'1x':>8s} {'10x':>8s} {'slope':>7s}")
for q, x, y, r in rows:
    print(f"{q:45s} {x:8.2f} {y:8.2f} {r:6.1f}x")
slopes = sorted(r for _, _, _, r in rows)
n = len(slopes)
print(f"\nn={n} median={slopes[n // 2]:.2f}x p90={slopes[int(n * 0.9)]:.2f}x max={slopes[-1]:.2f}x")
print("worst5:", ", ".join(f"{q}={r:.1f}x" for q, _, _, r in rows[:5]))
