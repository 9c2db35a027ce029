#!/bin/bash
# k-ladder: scale-exponent regression gate (round-11 verdict asks #6/#7,
# query-set auto-derivation per round-12 ask #1).
#
# One command: (re)generate the GenSf sf0.1/sf1 corpora if absent, run
# the heavy queries warm-solo at both scales, compute per-query
#   k_time    = log10(t_sf1 / t_sf0.1)          (calib-normalized)
#   k_shuffle = log10(bytes_sf1 / bytes_sf0.1)  (exec_metrics shuffle_write)
# and diff both against the committed expectations in
# tools/k_ladder_expected.tsv. Exit 1 on any exponent outside its
# tolerance — scale exponents are a gate, not a one-round study.
#
# QUERY SET (round-13): derived, not hard-coded — every query whose
# steady time in the last committed quiet full-suite baseline
# (BENCH_LOCAL.json) exceeds K_LADDER_MIN_SEC (default 1.0 s), unioned
# with the pinned heavies below. A new heavy therefore enters the
# ladder the round it lands; a query with no expected.tsv row is
# measured and reported as NEW (with a proposed row) without failing
# the gate — committing its row is the builder's next action.
#
# d02/d07 run with onBudgetExceeded=proceed: the ladder's POINT for them
# is measuring the contract's quadratic candidate price, which the
# (correct, default-on) budget guards would otherwise fail fast.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${K_LADDER_DIR:-.tmp/gensf}
MIN_SEC=${K_LADDER_MIN_SEC:-1.0}
# Pinned floor: the scale-signal queries the ladder must always carry
# even if a quiet host dips them under the derivation threshold.
PINNED="g06_triangle_count,g15_adamic_adar,g16_assortativity,g11_kcore,g13_scc,d22_dbscan_grid,d09_substring_dup,d02_jaccard_neardup,d07_ppjoin_exact"

derive_queries() {
  python3 - "$MIN_SEC" "$PINNED" <<'EOF'
import json, sys
min_sec, pinned = float(sys.argv[1]), set(sys.argv[2].split(","))
qs = set(pinned)

def add(record):
    t = dict(record.get("queries", {}))
    for k, v in record.get("reruns", {}).items():  # steady = min(first, rerun)
        t[k] = min(t.get(k, v), v)
    qs.update(k for k, v in t.items() if v > min_sec)

# the committed QUIET baseline...
try:
    with open("BENCH_LOCAL.json") as f:
        add(json.load(f))
except Exception as e:
    print(f"[k_ladder] BENCH_LOCAL.json unreadable ({e})", file=sys.stderr)
# ...UNIONED with the most recent full-suite run (BENCH_MARKER.txt's
# full record): the quiet baseline only updates on a quiet host, so a
# query added during a contended stretch would otherwise stay out of
# the ladder until the host calms down (round-13: s15/l28/f25 were
# missing because BENCH_LOCAL still predates round 12). Load inflation
# can only ADD queries to a >threshold set — safe direction for a gate.
try:
    with open("BENCH_MARKER.txt") as f:
        for line in f:
            if line.startswith("BENCH_JSON_FULL "):
                add(json.loads(line[len("BENCH_JSON_FULL "):]))
except Exception as e:
    print(f"[k_ladder] BENCH_MARKER.txt unreadable ({e})", file=sys.stderr)
print(",".join(sorted(qs)))
EOF
}

QUERIES=${K_LADDER_QUERIES:-$(derive_queries)}
MEM=${SPARK_GRAFT_MEM:-8g}
echo "[k_ladder] query set: $QUERIES"

for sf in 0.1 1; do
  d="$OUT/sf$sf"
  if [ ! -d "$d/documents.parquet" ]; then
    echo "[k_ladder] generating $d"
    tools/run_graft.sh graft.tools.GenSf "$d" "$sf"
  fi
done

mkdir -p .tmp
for sf in 0.1 1; do
  echo "[k_ladder] bench sf$sf"
  JAVA_TOOL_OPTIONS="-Dspark.graft.d02.onBudgetExceeded=proceed -Dspark.graft.d07.onBudgetExceeded=proceed" \
  SPARK_GRAFT_MEM="$MEM" SPARK_GRAFT_SF_DIR="$OUT/sf$sf" \
  SPARK_GRAFT_WARM=1 SPARK_GRAFT_ONLY="$QUERIES" \
    tools/run_graft.sh graft.Bench 2>/dev/null \
    | grep -m1 '"queries"' > ".tmp/k_ladder_sf$sf.json"
done

python3 tools/k_ladder_report.py \
  .tmp/k_ladder_sf0.1.json .tmp/k_ladder_sf1.json tools/k_ladder_expected.tsv
