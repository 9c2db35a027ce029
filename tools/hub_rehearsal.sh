#!/bin/bash
# Hub-regime GATE (round-13 verdict ask #1; was a print-only rehearsal in
# round 13). One command reproduces the PLANS.md wedge-family measurement
# on a power-law corpus and EXITS 1 on drift, same discipline as
# tools/k_ladder.sh:
#
#  1. generate GenSf zipf corpora at sf0.1 and sf1 (l_suppkey/l_partkey
#     drawn floor(N*u^2) — Zipf-like head; see GenSf scaladoc)
#  2. WedgeStats shape gate: the corpus is deterministic, so the
#     branch-deciding quantities are pinned EXACTLY — sf1z must price
#     8_049_075_942 wedges with 369 grid-salted nodes (p <= 5); a drift
#     here means the generator or the degree/salting arithmetic changed
#  3. bench g06/g15 warm-solo at both scales (onWedgesExceeded=proceed:
#     the sf1z bill is over the default-on 2e9 cap BY DESIGN — measuring
#     the cost an operator opts into is this gate's point) and diff
#     k_time/k_shuffle against tools/hub_expected.tsv via
#     k_ladder_report.py (exit 1 on excursion)
#  4. resource-bound gate at sf1z: g15 spill_disk <= 80 GiB and
#     peak_exec_mem <= 1 GiB (measured 48.6 GiB / 396 MB) — the grid
#     salting's "every task holds ~budget wedges" promise as a number
#  5. bench g06 once more at sf1z with broadcastEdgeCap=1M to force the
#     above-cap shuffle-closure branch (must complete; printed, ungated —
#     spill-heavy and host-sensitive)
#
# Outputs land in .tmp/hub_sf{0.1,1}z.json / .tmp/hub_sf1z_shufclo.json.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${HUB_DIR:-.tmp/gensf}
MEM=${SPARK_GRAFT_MEM:-8g}
ZIPF=${HUB_ZIPF:-zipf}

for sf in 0.1 1; do
  d="$OUT/sf${sf}z"
  if [ ! -d "$d/documents.parquet" ]; then
    echo "[hub] generating $d ($ZIPF)"
    tools/run_graft.sh graft.tools.GenSf "$d" "$sf" 31 "$ZIPF"
  fi
done

mkdir -p .tmp
echo "[hub] WedgeStats shape gate"
for sf in 0.1 1; do
  tools/run_graft.sh graft.queries.WedgeStats "$OUT/sf${sf}z" 2>/dev/null \
    | { grep -m1 WEDGE_STATS || true; } > ".tmp/hub_wedge_sf${sf}z.txt"
  [ -s ".tmp/hub_wedge_sf${sf}z.txt" ] || {
    echo "[hub] WedgeStats sf${sf}z produced no record"; exit 1; }
  cat ".tmp/hub_wedge_sf${sf}z.txt"
done
python3 - <<'EOF'
import json
def rd(p):
    line = open(p).read().strip()
    return json.loads(line[len("WEDGE_STATS "):])
a = rd(".tmp/hub_wedge_sf0.1z.txt")
b = rd(".tmp/hub_wedge_sf1z.txt")
# exact pins: GenSf is deterministic, so any drift = generator or
# degree/salting arithmetic change (adjudicate, then update the pins)
expect = [
    ("sf0.1z edges", a["edges"], 48208),
    ("sf0.1z salted_nodes", a["salted_nodes"], 0),
    ("sf1z edges", b["edges"], 1898294),
    ("sf1z max_deg", b["max_deg"], 9999),
    ("sf1z total_wedges", b["total_wedges"], 8049075942),
    ("sf1z salted_nodes", b["salted_nodes"], 369),
    ("sf1z max_p", b["max_p"], 5),
]
fails = [(n, got, want) for n, got, want in expect if got != want]
for n, got, want in fails:
    print(f"  SHAPE FAIL {n}: {got} != {want}")
if fails:
    raise SystemExit(1)
print("  shape gate: all pins exact")
EOF

# Bench legs: the gate is the CAPTURED RECORD (non-empty json), not the
# JVM's shutdown status — an 8 GiB warm-solo heavy leg has OOM-exited
# (Spark code 52) during shutdown AFTER printing a complete record; a
# leg that dies before finishing produces no record and still fails.
for sf in 0.1 1; do
  echo "[hub] bench g06/g15 sf${sf}z"
  { JAVA_TOOL_OPTIONS="-Dspark.graft.graph.onWedgesExceeded=proceed" \
    SPARK_GRAFT_MEM="$MEM" SPARK_GRAFT_SF_DIR="$OUT/sf${sf}z" \
    SPARK_GRAFT_WARM=1 SPARK_GRAFT_ONLY=g06_triangle_count,g15_adamic_adar \
    tools/run_graft.sh graft.Bench 2>".tmp/hub_sf${sf}z.stderr" || true; } \
    | { grep -m1 '"queries"' || true; } > ".tmp/hub_sf${sf}z.json"
  [ -s ".tmp/hub_sf${sf}z.json" ] || {
    echo "[hub] sf${sf}z leg produced no record (see .tmp/hub_sf${sf}z.stderr)"
    exit 1; }
done

echo "[hub] exponent gate (tools/hub_expected.tsv)"
python3 tools/k_ladder_report.py \
  .tmp/hub_sf0.1z.json .tmp/hub_sf1z.json tools/hub_expected.tsv

echo "[hub] resource-bound gate at sf1z"
python3 - <<'EOF'
import json
r = json.load(open(".tmp/hub_sf1z.json"))
m = r.get("exec_metrics", {}).get("g15_adamic_adar", {})
spill, peak = m.get("spill_disk", 0), m.get("peak_exec_mem", 0)
SPILL_CAP, PEAK_CAP = 80 << 30, 1 << 30
print(f"  g15 sf1z: spill_disk {spill} (cap {SPILL_CAP}), "
      f"peak_exec_mem {peak} (cap {PEAK_CAP})")
if spill > SPILL_CAP or peak > PEAK_CAP:
    print("  RESOURCE FAIL: grid salting no longer bounds task state")
    raise SystemExit(1)
print("  resource gate: within bounds")
EOF

echo "[hub] bench g06 sf1z, forced shuffle-closure (broadcastEdgeCap=1M)"
{ JAVA_TOOL_OPTIONS="-Dspark.graft.graph.broadcastEdgeCap=1000000 -Dspark.graft.graph.onWedgesExceeded=proceed" \
  SPARK_GRAFT_MEM="$MEM" SPARK_GRAFT_SF_DIR="$OUT/sf1z" \
  SPARK_GRAFT_WARM=1 SPARK_GRAFT_ONLY=g06_triangle_count \
  tools/run_graft.sh graft.Bench 2>.tmp/hub_sf1z_shufclo.stderr || true; } \
  | { grep -m1 '"queries"' || true; } > .tmp/hub_sf1z_shufclo.json
[ -s .tmp/hub_sf1z_shufclo.json ] || {
  echo "[hub] shuffle-closure leg produced no record"; exit 1; }
python3 - <<'EOF'
import json
r = json.load(open(".tmp/hub_sf1z_shufclo.json"))
q = dict(r["queries"])
for k, v in r.get("reruns", {}).items():
    q[k] = min(q[k], v)
n = 3.27 / r["calib_sec"]
t = q["g06_triangle_count"] * n
m = r.get("exec_metrics", {}).get("g06_triangle_count", {})
print(f"  g06 shuffle-closure sf1z: {t:.1f} s normalized, "
      f"spill_disk {m.get('spill_disk', 0)} (completed; ungated)")
EOF

echo "[hub] gate green"
