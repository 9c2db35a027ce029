#!/bin/bash
# k-ladder: scale-exponent regression gate (round-11 verdict asks #6/#7).
#
# One command: (re)generate the GenSf sf0.1/sf1 corpora if absent, run
# the named heavy queries warm-solo at both scales, compute per-query
#   k_time    = log10(t_sf1 / t_sf0.1)          (calib-normalized)
#   k_shuffle = log10(bytes_sf1 / bytes_sf0.1)  (exec_metrics shuffle_write)
# and diff both against the committed expectations in
# tools/k_ladder_expected.tsv. Exit 1 on any exponent outside its
# tolerance — scale exponents become a gate, not a one-round study.
#
# d02 runs with spark.graft.d02.onBudgetExceeded=proceed: the ladder's
# POINT for d02 is measuring the contract's quadratic candidate price,
# which the (correct, default-on) budget guard would otherwise fail fast.
set -euo pipefail
cd "$(dirname "$0")/.."

OUT=${K_LADDER_DIR:-.tmp/gensf}
QUERIES=${K_LADDER_QUERIES:-g06_triangle_count,g15_adamic_adar,g16_assortativity,g11_kcore,g13_scc,d22_dbscan_grid,d09_substring_dup,d02_jaccard_neardup,d07_ppjoin_exact}
MEM=${SPARK_GRAFT_MEM:-8g}

for sf in 0.1 1; do
  d="$OUT/sf$sf"
  if [ ! -d "$d/documents.parquet" ]; then
    echo "[k_ladder] generating $d"
    tools/run_graft.sh graft.tools.GenSf "$d" "$sf"
  fi
done

mkdir -p .tmp
for sf in 0.1 1; do
  echo "[k_ladder] bench sf$sf ($QUERIES)"
  JAVA_TOOL_OPTIONS="-Dspark.graft.d02.onBudgetExceeded=proceed" \
  SPARK_GRAFT_MEM="$MEM" SPARK_GRAFT_SF_DIR="$OUT/sf$sf" \
  SPARK_GRAFT_WARM=1 SPARK_GRAFT_ONLY="$QUERIES" \
    tools/run_graft.sh graft.Bench 2>/dev/null \
    | grep '"queries"' | head -1 > ".tmp/k_ladder_sf$sf.json"
done

python3 tools/k_ladder_report.py \
  .tmp/k_ladder_sf0.1.json .tmp/k_ladder_sf1.json tools/k_ladder_expected.tsv
