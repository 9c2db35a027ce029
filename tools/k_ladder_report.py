#!/usr/bin/env python3
"""k-ladder report: per-query scale exponents from two bench runs, with
the committed expectations as a regression gate (round-11 asks #6/#7;
round-12 asks #1 — auto-included queries + per-row adjudication).

usage: k_ladder_report.py <sf0.1.json> <sf1.json> <expected.tsv>

Each json is one full-record graft.Bench line (with "queries",
"reruns", "calib_sec", "exec_metrics"). Times are the steady view
(min(first, rerun)) normalized by the run's calib probe; shuffle bytes
come from exec_metrics (first-pass attribution). Exponents:
k = log10(v_sf1 / v_sf0.1) for one decade.

expected.tsv columns: query, k_time, tol_time, k_shuffle, tol_shuffle,
adjudication, note. '-' for k_shuffle disables the shuffle gate
(sub-MB shuffle writes wobble with AQE coalescing and are not a scale
signal). The adjudication column classifies WHY a row's exponents look
the way they do — so a future regression cannot hide behind an
unwritten rationale:
  linear             genuinely ~O(n) work and shuffle
  densification      k_shuffle > 1 because the ANSWER densifies on the
                     synthetic corpus (pair/edge output grows faster
                     than nodes), not because the plan degrades
  contract-quadratic the operator's recall contract prices a quadratic
                     candidate set on this corpus; pinned, not excused
  rounds-flat        iterative op whose round count barely grows
  spill-adjacent     time swings with disk contention; wide tolerance
  scan-bound         dominated by the input scan
  bounded-by-cap     shuffle ramps to an explicit size cap then
                     plateaus — superlinear below the cap by design
  sf-invariant       reads fixed fixtures / replays a fixed stream;
                     both axes ~0 by design

A row with '-' in the k_time column is adjudication-only: the query
sits below the ladder's 1 s derivation threshold, and the row exists so
shuffle_exponent.py's exemption registry stays single-source (round-13
verdict ask #5). If such a query is ever measured, it reports but only
its shuffle gate (if set) is enforced.

A measured query with NO expected row is reported as NEW with a
proposed tsv row and does NOT fail the gate — commit the row to arm it.
Exit 1 only on a gated exponent outside its tolerance.
"""
import json
import math
import sys


def load(path):
    with open(path) as f:
        r = json.load(f)
    q = dict(r["queries"])
    for k, v in r.get("reruns", {}).items():
        q[k] = min(q.get(k, v), v)
    calib = r.get("calib_sec", 3.27)
    norm = 3.27 / calib
    times = {k: v * norm for k, v in q.items()}
    shuf = {k: m.get("shuffle_write", 0)
            for k, m in r.get("exec_metrics", {}).items()}
    return times, shuf


def main():
    t0, s0 = load(sys.argv[1])
    t1, s1 = load(sys.argv[2])
    expected = {}
    with open(sys.argv[3]) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            expected[parts[0]] = parts[1:]
    fails = []
    proposals = []
    print(f"{'query':<24} {'t0.1':>7} {'t1':>8} {'k_time':>7} "
          f"{'sw0.1':>10} {'sw1':>11} {'k_sw':>6}  gate")
    for q in sorted(set(t0) & set(t1)):
        kt = math.log10(t1[q] / t0[q]) if t0[q] > 0 else float("nan")
        sw0, sw1 = s0.get(q, 0), s1.get(q, 0)
        ks = math.log10(sw1 / sw0) if sw0 > 0 and sw1 > 0 else float("nan")
        if q in expected:
            ekt, etolt, eks, etols = expected[q][:4]
            adj = expected[q][4] if len(expected[q]) > 4 else "?"
            # '-' time gate: adjudication-only row (sub-threshold query
            # recorded for shuffle_exponent.py's registry) — no time gate
            ok = ekt == "-" or abs(kt - float(ekt)) <= float(etolt)
            msgs = [] if ok else [f"k_time {kt:.2f} vs {ekt}±{etolt}"]
            if eks != "-" and not math.isnan(ks):
                if abs(ks - float(eks)) > float(etols):
                    msgs.append(f"k_shuffle {ks:.2f} vs {eks}±{etols}")
            verdict = f"PASS [{adj}]" if not msgs \
                else "FAIL " + "; ".join(msgs) + f" [{adj}]"
            if msgs:
                fails.append((q, msgs))
        else:
            # auto-included (derived from the committed bench) but not
            # yet gated: report + propose, never fail
            verdict = "NEW (no gate)"
            ksf = "-\t-" if math.isnan(ks) or max(sw0, sw1) < 1 << 20 \
                else f"{ks:.2f}\t0.35"
            proposals.append(
                f"{q}\t{kt:.2f}\t0.25\t{ksf}\tlinear\tauto-included "
                f"round-13; adjudicate before committing")
        print(f"{q:<24} {t0[q]:>7.2f} {t1[q]:>8.2f} {kt:>7.2f} "
              f"{sw0:>10} {sw1:>11} {ks:>6.2f}  {verdict}")
    if proposals:
        print("\n== proposed expected.tsv rows (adjudicate, then commit) ==")
        for p in proposals:
            print("  " + p)
    if fails:
        print(f"\n== {len(fails)} exponent regression(s) ==")
        for q, msgs in fails:
            print(f"  {q}: {'; '.join(msgs)}")
        sys.exit(1)
    print("\n== all gated exponents within tolerance ==")


if __name__ == "__main__":
    main()
