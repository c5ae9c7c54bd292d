#!/usr/bin/env bash
# Round-12 sf100 wide sweep (VERDICT r11 item 3): drive ~10 high-value
# PRODUCTION queries to cross-engine-exact at the sf100 decade (5M docs /
# 2M vectors / 600M lineitem). Per-query resumable log, same format as
# sweep_wide.sh. Tool choice per query:
#   - selfcheck_duck.py: in-DuckDB EXCEPT ALL multiset compare — needed at
#     doc grain (5M-row results exceed the pandas compare) and harmless
#     for the small ones, so it's the default here.
#   - check_clusters_scaled.py: q111 — the recursive reachability oracle is
#     infeasible in ANY engine at percolated component sizes; min-label
#     propagation with pointer jumping computes the same unique fixpoint.
#   - check_lsh_scaled.py: q110 — the pair stream is checked streamed,
#     first-colliding-band rule (74M pairs at sf10 scale grows ~10x here).
# Usage: tools/sweep100.sh <sfDir> <dumpDir> [logFile]
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/tmp/sf100}"; OUT="${2:-/tmp/v100wide}"; LOG="${3:-$OUT/selfcheck.log}"
mkdir -p "$OUT"; touch "$LOG"

run() { # run <name> <cmd...>
  local n="$1"; shift
  if grep -q "^PASS $n\$" "$LOG"; then return; fi
  echo "[sweep100] $(date +%H:%M:%S) checking $n" >&2
  local res
  res=$("$@" 2>&1 | grep -E "^(PASS|FAIL)" | tail -1 || true)
  echo "${res:-FAIL $n: check produced no verdict}" | tee -a "$LOG"
}

# cheap/linear first, the heavy shingle-chain and vector checks last
for q in q84_bm25 q104_bm25_ln q102_bigram_lm q103_dsir_weights \
         q79_simhash_scale q92_crosssource_dups q85_semdedup \
         q32_dedup_minhash_lsh q113_dedup_survivors_lsh; do
  run "$q" python3 tools/selfcheck_duck.py "$SF" "$OUT" "$q"
done
run q111_embedding_clusters python3 tools/check_clusters_scaled.py "$SF" "$OUT"
run q110_ann_lsh_scaled python3 tools/check_lsh_scaled.py "$SF" "$OUT"
echo "== $(grep -c '^PASS' "$LOG") pass / $(grep -c '^FAIL' "$LOG" || true) fail (log: $LOG)"
