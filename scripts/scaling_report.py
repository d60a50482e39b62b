#!/usr/bin/env python3
"""Wrap raw Bench JSON lines into the round's scaling artifacts with
min-based ratios vs the sf0.1 anchor run (the BENCH_sf{1,10}_r{N}.json
shape the judge diffs).
Usage: scaling_report.py <sf01.json> <scaled.json> <label> <out.json> [note]
"""
import json
import sys

sf01_path, scaled_path, label, out_path = sys.argv[1:5]
note = sys.argv[5] if len(sys.argv) > 5 else ""

sf01 = json.load(open(sf01_path))
scaled = json.load(open(scaled_path))

anchor = sf01.get("queries_min", sf01["queries"])
scaled_min = scaled.get("queries_min", scaled["queries"])
ratios = {
    q: round(scaled_min[q] / anchor[q], 3)
    for q in sorted(scaled_min)
    if q in anchor and anchor[q] > 0
}

out = {label: scaled, "sf01": sf01, "ratio_vs_sf01_min": ratios}
if note:
    out["note"] = note
json.dump(out, open(out_path, "w"), indent=1, sort_keys=False)
worst = sorted(ratios.items(), key=lambda kv: -kv[1])[:10]
print(f"{out_path}: {len(ratios)} ratios; worst: {worst}")
