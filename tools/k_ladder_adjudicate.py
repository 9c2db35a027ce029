#!/usr/bin/env python3
"""Draft adjudicated expected.tsv rows from a k-ladder measurement pair.

usage: k_ladder_adjudicate.py <sf0.1.json> <sf1.json> <expected.tsv>

For every measured query WITHOUT a committed expected.tsv row, print a
draft row (tab-separated, ready to append) with a HEURISTIC adjudication
the builder must review before committing:

  scan-bound    k_time < 0.45 (per-session floors dominate the decade)
  rounds-flat   k_time < 0.45 on an iterative family (g05/g07-14, d22)
  linear        0.45 <= k_time <= 1.05 and k_shuffle <= 1.15
  densification k_shuffle > 1.15 on a pair/graph family
  REVIEW        anything else — do not commit without a reason

Shuffle gates are disabled ('-') when the larger-SF shuffle write is
under 1 MiB (AQE wobble, no scale signal). Tolerances default to 0.25
time / 0.35 shuffle; spill-adjacent families get 0.30 time.
"""
import json
import math
import sys

sys.path.insert(0, __import__("os").path.dirname(__file__))
from k_ladder_report import load  # noqa: E402

ITERATIVE = ("g05", "g07", "g08", "g09", "g11", "g12", "g13", "g14",
             "d22", "m30")
PAIRY = ("g06", "g15", "g16", "d0", "d1", "d2", "j21", "x06")
SPILLY = ("g06", "g15", "d07", "d02")


def main():
    t0, s0 = load(sys.argv[1])
    t1, s1 = load(sys.argv[2])
    expected = set()
    with open(sys.argv[3]) as f:
        for line in f:
            if line.strip() and not line.startswith("#"):
                expected.add(line.split("\t")[0])
    for q in sorted(set(t0) & set(t1)):
        if q in expected:
            continue
        kt = math.log10(t1[q] / t0[q]) if t0[q] > 0 else float("nan")
        sw0, sw1 = s0.get(q, 0), s1.get(q, 0)
        small = sw1 < (1 << 20) or sw0 <= 0
        ks = math.log10(sw1 / sw0) if not small else float("nan")
        if small:
            ksf, note_sw = "-\t-", "shuffle sub-MB, no scale signal"
        else:
            ksf, note_sw = f"{ks:.2f}\t0.35", f"shuffle {sw0}->{sw1} B"
        if kt < 0.45:
            adj = "rounds-flat" if q.startswith(ITERATIVE) else "scan-bound"
        elif kt <= 1.05 and (small or ks <= 1.15):
            adj = "linear"
        elif not small and ks > 1.15 and q.startswith(PAIRY):
            adj = "densification"
        else:
            adj = "REVIEW"
        tol_t = "0.30" if q.startswith(SPILLY) else "0.25"
        print(f"{q}\t{kt:.2f}\t{tol_t}\t{ksf}\t{adj}\t"
              f"auto-included round-13 ({note_sw}; "
              f"t {t0[q]:.2f}->{t1[q]:.2f} s)")


if __name__ == "__main__":
    main()
