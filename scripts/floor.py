#!/usr/bin/env python3
"""Convert a Bench run's full-precision detail line into the committed
floor-file shape (legacy compact-line schema, full precision).

Usage: python3 scripts/floor.py <bench.log> > BENCH_LOCAL_sfX.json

The compact stdout line is magnitude-scaled for the collector's tail
window (and falls back to integer seconds at large registries), so
committed floors are built from the detail line instead.
"""
import json
import sys

detail = None
for line in open(sys.argv[1], errors="replace"):
    i = line.find('{"detail":"full"')
    if i >= 0:
        detail = json.loads(line[i:].strip())
if detail is None:
    sys.exit("no detail line found")

print(json.dumps({
    "metric": "total",
    "value": detail["total"],
    "unit": "sec",
    "failures": detail["failures"],
    "iters": detail["iters"],
    "queries": detail["queries_med"],
    "queries_min": detail["queries_min"],
    "sf": detail["sf"],
}, separators=(",", ":")))
