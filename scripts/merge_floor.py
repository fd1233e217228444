#!/usr/bin/env python3
"""Merge a fresh Bench detail line into an existing committed floor.

Usage: python3 scripts/merge_floor.py <bench.log> <old_floor.json> [freshKey...]

Per-key minima are merged elementwise with the old floor (old keys
bridged through scripts/renames.json chains, so a renamed key keeps
its history). Keys listed as freshKey (plus keys absent from the old
floor) take the new run's value only — use for entries whose plan
changed this round. Medians/total/iters come from the fresh run.
Writes the merged floor JSON to stdout (same shape floor.py emits).
"""
import json
import os
import sys

log, old_path = sys.argv[1], sys.argv[2]
fresh = set(sys.argv[3:])

detail = None
for line in open(log, errors="replace"):
    i = line.find('{"detail":"full"')
    if i >= 0:
        detail = json.loads(line[i:].strip())
if detail is None:
    sys.exit("no detail line found")

here = os.path.dirname(os.path.abspath(__file__))
renames = json.load(open(os.path.join(here, "renames.json")))["renames"]


def live(k):
    seen = set()
    while k in renames and k not in seen:
        seen.add(k)
        k = renames[k]["new"]
    return k


old = json.load(open(old_path))
old_min = {}
for k, v in old["queries_min"].items():
    lk = live(k)
    old_min[lk] = min(v, old_min.get(lk, float("inf")))

new_min = detail["queries_min"]
merged = {}
for k, v in new_min.items():
    if k in fresh or k not in old_min:
        merged[k] = v
    else:
        merged[k] = min(v, old_min[k])

dropped = sorted(set(old_min) - set(new_min))
if dropped:
    print(f"note: old floor keys not in this run (dropped): {dropped}",
          file=sys.stderr)

print(json.dumps({
    "metric": "total",
    "value": detail["total"],
    "unit": "sec",
    "failures": detail["failures"],
    "iters": detail["iters"],
    "queries": detail["queries_med"],
    "queries_min": merged,
    "sf": detail["sf"],
}, separators=(",", ":")))
