#!/usr/bin/env python3
"""Suite-wide shuffle-scaling check over the cheap Verify decade
(round-12 verdict ask #5).

usage: shuffle_exponent.py <exec_metrics_sf0.01.json> <exec_metrics_sf0.1.json>

graft.Verify writes exec_metrics.json (per-query shuffle-write bytes)
next to its parquet dumps, and the driver runs Verify at BOTH sf0.01
and sf0.1 — so every one of the ~359 queries gets a free one-decade
shuffle ladder each round, not just the ~12 the k-ladder times at
GenSf scale. This checker flags any query whose shuffle-write bytes
grow SUPERLINEARLY across the decade:

    k_shuffle = log10(bytes_sf0.1 / bytes_sf0.01)   (10x rows)
    flag if k_shuffle > 1 + TOL and bytes_sf0.1 >= MIN_BYTES

Sub-MB shuffles are skipped — AQE coalescing and map-status rounding
make them wobble with no scale signal (same rationale as the k-ladder's
'-' rows). Exemptions come from ONE registry — tools/k_ladder_expected
.tsv — and nowhere else (round-13 verdict ask #5): any query whose
committed adjudication there is `contract-quadratic`, `densification`,
or `bounded-by-cap` is exempt. Sub-1 s queries that need an exemption
get a tsv row with '-' time/shuffle gates (the ladder doesn't time
them; the row exists purely as the reviewed adjudication record).
Exempt queries are still printed so the price stays visible.

Exit 1 on any non-exempt superlinear query.
"""
import json
import math
import os
import sys

TOL = 0.25          # allowed excess over linear (log10 units)
MIN_BYTES = 1 << 20  # ignore sub-MiB shuffles at the larger SF

EXEMPT_ADJUDICATIONS = {"contract-quadratic", "densification",
                        "bounded-by-cap"}


def ladder_exemptions(path):
    """query -> 'adjudication: note' for rows whose adjudication class
    is exempt (the ladder prices them each round)."""
    out = {}
    try:
        with open(path) as f:
            for line in f:
                line = line.rstrip("\n")
                if not line or line.startswith("#"):
                    continue
                p = line.split("\t")
                if len(p) >= 6 and p[5] in EXEMPT_ADJUDICATIONS:
                    note = p[6] if len(p) > 6 else ""
                    out[p[0]] = f"{p[5]}: {note}"
    except OSError as e:
        print(f"[shuffle_exponent] expected.tsv unreadable: {e}",
              file=sys.stderr)
    return out


def load(path):
    with open(path) as f:
        m = json.load(f)
    return {k: v.get("shuffle_write", 0) for k, v in m.items()}


def main():
    s0, s1 = load(sys.argv[1]), load(sys.argv[2])
    tsv = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "k_ladder_expected.tsv")
    exempt = ladder_exemptions(tsv)
    fails, exempt_hits, checked = [], [], 0
    for q in sorted(set(s0) | set(s1)):
        b0, b1 = s0.get(q, 0), s1.get(q, 0)
        if b1 < MIN_BYTES:
            continue
        checked += 1
        if b0 <= 0:
            # a shuffle that only EXISTS at the larger SF is itself a
            # scale smell (size-gated plan switches excluded by MIN_BYTES
            # on the small side being 0 only when truly absent)
            k = float("inf")
        else:
            k = math.log10(b1 / b0)
        if k > 1.0 + TOL:
            if q in exempt:
                exempt_hits.append((q, k, b0, b1))
            else:
                fails.append((q, k, b0, b1))
    print(f"[shuffle_exponent] {checked} queries >= 1 MiB shuffle at the "
          f"larger SF; gate = k_shuffle <= {1.0 + TOL}")
    for q, k, b0, b1 in exempt_hits:
        print(f"  EXEMPT {q}: k={k:.2f} ({b0} -> {b1} bytes)\n"
              f"         {exempt[q]}")
    if fails:
        print(f"\n== {len(fails)} superlinear shuffle(s) ==")
        for q, k, b0, b1 in fails:
            print(f"  FAIL {q}: k={k:.2f} ({b0} -> {b1} bytes) — "
                  "adjudicate (densification vs plan defect) before "
                  "exempting")
        sys.exit(1)
    print("== all non-exempt queries scale sublinearly/linearly ==")


if __name__ == "__main__":
    main()
