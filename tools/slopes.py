#!/usr/bin/env python3
"""Compare two Bench per_query lines (e.g. sf0.1 vs a 10x replica) and
print the slope table: per-query 10x/1x ratio, sorted descending, plus
summary stats. Rows the bench marks as deliberate fixed-config oracle
demos (per_query line, "demo_fixed_config": {demo: production_twin})
are tagged with their twin and EXCLUDED from the summary statistics —
their collision-floor slopes are by design; the twin's slope is the
one that matters at scale.
Usage: python3 tools/slopes.py bench_1x.jsonl bench_10x.jsonl
"""
import json
import sys


def load(path):
    per, demo = None, {}
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
            demo = obj.get("demo_fixed_config", {}) or {}
    if per is None:
        raise SystemExit(f"no per_query line in {path}")
    return per, demo


(a, demo_a), (b, demo_b) = load(sys.argv[1]), load(sys.argv[2])
demo = {**demo_a, **demo_b}
common = sorted(set(a) & set(b), key=lambda q: -(b[q] / max(a[q], 1e-9)))
rows = [(q, a[q], b[q], b[q] / max(a[q], 1e-9)) for q in common]
print(f"{'query':45s} {'1x':>8s} {'10x':>8s} {'slope':>7s}")
for q, x, y, r in rows:
    tag = f"  [demo; twin: {demo[q]}]" if q in demo else ""
    print(f"{q:45s} {x:8.2f} {y:8.2f} {r:6.1f}x{tag}")
prod = [(q, x, y, r) for q, x, y, r in rows if q not in demo]
slopes = sorted(r for _, _, _, r in prod)
n = len(slopes)
if n:
    print(f"\nn={n} (excl. {len(rows) - n} demo rows) "
          f"median={slopes[n // 2]:.2f}x p90={slopes[int(n * 0.9)]:.2f}x max={slopes[-1]:.2f}x")
    print("worst5:", ", ".join(f"{q}={r:.1f}x" for q, _, _, r in prod[:5]))
for q in sorted(demo):
    if q in a and q in b:
        r = b[q] / max(a[q], 1e-9)
        tw = demo[q]
        tr = (b[tw] / max(a[tw], 1e-9)) if (tw in a and tw in b) else None
        twin_s = f"{tr:.1f}x" if tr is not None else "n/a"
        print(f"demo {q}: {r:.1f}x (oracle-demo config; production twin {tw}: {twin_s})")
