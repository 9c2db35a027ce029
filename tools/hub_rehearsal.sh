#!/bin/bash
# Hub-regime rehearsal (round-13): one command reproduces the PLANS.md
# round-13 wedge-family measurement on a power-law corpus.
#
#  1. generate GenSf zipf corpora at sf0.1 and sf1 (l_suppkey/l_partkey
#     drawn floor(N*u^2) — Zipf-like head; see GenSf scaladoc)
#  2. print WedgeStats for both (edges, max degree, Σdeg² wedges,
#     grid-salted node count p(w) > 1, implied partitions)
#  3. bench g06/g15 warm-solo at both scales (grid salting fires at sf1:
#     369 salted nodes, p ≤ 5 on the committed corpus shape)
#  4. bench g06 once more at sf1 with broadcastEdgeCap=1M to force the
#     above-cap shuffle-closure branch
#
# Outputs land in .tmp/hub_sf{0.1,1}z.json / .tmp/hub_sf1z_shufclo.json.
# Times are host-dependent; compare calib-normalized (the PLANS table).
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
  tools/run_graft.sh graft.queries.WedgeStats "$d" 2>/dev/null | grep WEDGE_STATS
done

mkdir -p .tmp
for sf in 0.1 1; do
  echo "[hub] bench g06/g15 sf${sf}z"
  SPARK_GRAFT_MEM="$MEM" SPARK_GRAFT_SF_DIR="$OUT/sf${sf}z" \
  SPARK_GRAFT_WARM=1 SPARK_GRAFT_ONLY=g06_triangle_count,g15_adamic_adar \
    tools/run_graft.sh graft.Bench 2>/dev/null \
    | grep -m1 '"queries"' > ".tmp/hub_sf${sf}z.json"
done

echo "[hub] bench g06 sf1z, forced shuffle-closure (broadcastEdgeCap=1M)"
JAVA_TOOL_OPTIONS="-Dspark.graft.graph.broadcastEdgeCap=1000000" \
SPARK_GRAFT_MEM="$MEM" SPARK_GRAFT_SF_DIR="$OUT/sf1z" \
SPARK_GRAFT_WARM=1 SPARK_GRAFT_ONLY=g06_triangle_count \
  tools/run_graft.sh graft.Bench 2>/dev/null \
  | grep -m1 '"queries"' > .tmp/hub_sf1z_shufclo.json

python3 - <<'EOF'
import json, math
def rd(p):
    r = json.load(open(p))
    q = dict(r["queries"])
    for k, v in r.get("reruns", {}).items(): q[k] = min(q[k], v)
    n = 3.27 / r["calib_sec"]
    return {k: v * n for k, v in q.items()}, r.get("exec_metrics", {})
a, ea = rd(".tmp/hub_sf0.1z.json"); b, eb = rd(".tmp/hub_sf1z.json")
c, ec = rd(".tmp/hub_sf1z_shufclo.json")
print(f"{'query':<24} {'t sf0.1z':>9} {'t sf1z':>8} {'k_time':>7} "
      f"{'spill_disk sf1z':>16}")
for q in sorted(a):
    k = math.log10(b[q] / a[q])
    sp = eb.get(q, {}).get("spill_disk", 0)
    print(f"{q:<24} {a[q]:>9.2f} {b[q]:>8.2f} {k:>7.2f} {sp:>16}")
q = "g06_triangle_count"
print(f"{q+' (shuffle-closure)':<24} {'—':>9} {c[q]:>8.2f} {'—':>7} "
      f"{ec.get(q, {}).get('spill_disk', 0):>16}")
EOF
