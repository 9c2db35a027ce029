#!/usr/bin/env python3
"""Pair-wobble analysis over N bench runs: for each adjacent run pair,
count queries whose STEADY-STATE times (first-pass with the rerun
minimum substituted where a rerun exists, i.e. min(first, rerun))
disagree >=2x, split by magnitude."""
#
# usage: python3 tools/bench_pairs.py run1.json run2.json [...]
# where each file is the bare full-record line of a graft.Bench run
# (grep '"queries"' on stdout). Used for the BASELINE.md round-11
# five-run pair table.
import json, sys

runs = []
for p in sys.argv[1:]:
    with open(p) as f:
        runs.append(json.load(f))

for i in range(len(runs) - 1):
    a, b = runs[i]["queries"], runs[i + 1]["queries"]
    # steady-state view: substitute rerun minima where present
    for r, q in ((runs[i], a), (runs[i + 1], b)):
        for k, v in r.get("reruns", {}).items():
            q[k] = min(q[k], v)
    pairs = []
    for k in a:
        if k in b:
            lo, hi = sorted((a[k], b[k]))
            if lo > 1e-9 and hi / lo >= 2.0:
                pairs.append((k, a[k], b[k], hi))
    over03 = [p for p in pairs if p[3] > 0.3]
    over1 = [p for p in pairs if p[3] > 1.0]
    ta = sum(a.values()); tb = sum(b.values())
    print(f"pair {i+1}-{i+2}: totals {ta:.1f}/{tb:.1f} s, "
          f"calib {runs[i]['calib_sec']:.2f}/{runs[i+1]['calib_sec']:.2f}, "
          f">=2x: {len(pairs)}, of those >0.3s: {len(over03)}, >1s: {len(over1)}")
    for k, x, y, _ in sorted(pairs, key=lambda p: -p[3])[:8]:
        print(f"    {k}: {x:.2f} <-> {y:.2f}")
