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

# Resume provenance for Verify's _GRAFT_STAMP (ADVICE r17): dumps are
# evidence only for the code that produced them.
GRAFT_CODE_SHA=$(git rev-parse HEAD 2>/dev/null || echo unset)
export GRAFT_CODE_SHA

# Scope hygiene (ADVICE r14): GRAFT_RECALL_ONLY is a widening hook for
# check_lsh_sampled.py — leaked into a sweep it would silently skip the
# whole precision half and the bare PASS line would record a full-scope
# verdict. A sweep is always full-scope; drop any inherited value.
unset GRAFT_RECALL_ONLY

# Disk safety (VERDICT r13 item 2): the r13 sweep died once on
# /tmp/duck_spill ENOSPC mid-check. Put the DuckDB spill dir on the volume
# with the most free space (unless the caller pinned GRAFT_DUCK_TMP), and
# refuse to start a fresh sweep when free space is below a floor — the
# checkers also pre-flight per-query against their own spill estimates.
if [ -z "${GRAFT_DUCK_TMP:-}" ]; then
  best=$(df -P /tmp /var/tmp "$OUT" 2>/dev/null | awk 'NR>1 {print $4, $6}' \
    | sort -rn | head -1 | awk '{print $2}')
  export GRAFT_DUCK_TMP="${best:-/tmp}/duck_spill"
fi
mkdir -p "$GRAFT_DUCK_TMP"
free_gb=$(df -P "$GRAFT_DUCK_TMP" | awk 'NR==2 {print int($4/1048576)}')
echo "[sweep100] spill dir $GRAFT_DUCK_TMP (${free_gb} GB free)" >&2
if [ "$free_gb" -lt 20 ]; then
  echo "[sweep100] ABORT: ${free_gb} GB free on $GRAFT_DUCK_TMP is below" \
       "the 20 GB floor for sf100 checks — clear space or point" \
       "GRAFT_DUCK_TMP at a larger volume" >&2
  exit 1
fi

run() { # run <name> <cmd...>
  local n="$1"; shift
  # Resume on word boundary, not end anchor: check_*_scaled.py print
  # "PASS <name> (detail)" so "^PASS $n$" never matched them and the
  # multi-hour checks re-ran on every resume (round-12 ADVICE).
  if grep -q "^PASS $n\b" "$LOG"; then return; fi
  echo "[sweep100] $(date +%H:%M:%S) checking $n" >&2
  local out res detail scope
  out=$("$@" 2>&1)
  res=$(printf '%s\n' "$out" | grep -E "^(PASS|FAIL)" | tail -1 || true)
  # Scope honesty (ADVICE r14): a downgraded-scope pass — the clusters
  # checker's layered-fallback WARN, or a SKIPped precision half — must be
  # visible in the log NEXT TO the verdict, not discarded, or the resume
  # grep records it indistinguishably from a full-scope PASS forever.
  scope=$(printf '%s\n' "$out" | grep -E "^(WARN|SKIP)" | head -3 || true)
  if [ -n "$scope" ]; then
    printf '%s\n' "$scope" | sed "s/^/SCOPE $n: /" | tee -a "$LOG"
  fi
  # Normalize the logged line so the resume grep is format-independent:
  # strip the checker's own "FAIL <whatever>: " prefix only when it has
  # one; otherwise log the raw line minus the FAIL keyword (round-13
  # ADVICE: ${res#FAIL*: } left a doubled "FAIL ... FAIL" prefix when the
  # checker's FAIL line carried no ': ').
  case "$res" in
    PASS*)      echo "PASS $n" | tee -a "$LOG" ;;
    FAIL*": "*) echo "FAIL $n: ${res#FAIL*: }" | tee -a "$LOG" ;;
    FAIL*)      detail="${res#FAIL}"; echo "FAIL $n:${detail:- no detail}" \
                  | tee -a "$LOG" ;;
    *)          echo "FAIL $n: check produced no verdict" | tee -a "$LOG" ;;
  esac
}

# cheap/linear first, the heavy shingle-chain and vector checks last.
# NOT in the list (round-12 reclassifications, see PLANS.md):
#   q92_crosssource_dups — anchor: its edge set IS the exact all-pairs
#     jaccardPairs relation (Σ C(df,2) ≈ 12B joined rows at sf100); a solo
#     dump exhausted this box's shuffle disk. Ground truth by design; the
#     lshVerified production analog is swept via q32/q113.
#   q85_semdedup — full-corpus √N̄ Lloyd TRAINING is hours of compute at
#     2M×32 before the (cid-bucketed, fine) prune starts; production
#     trains on a sample (see semdedupSampleTrained).
for q in q84_bm25 q104_bm25_ln q102_bigram_lm q103_dsir_weights \
         q79_simhash_scale q32_dedup_minhash_lsh q113_dedup_survivors_lsh; do
  run "$q" python3 tools/selfcheck_duck.py "$SF" "$OUT" "$q"
done
# q110 BEFORE q111: at sf100 scale the full re-enumeration
# (check_lsh_scaled) refuses at its own preflight (~6e10 candidates), so
# q110 is checked by the split sampled checker (full-dump precision +
# sampled-cell recall) — and q111's checker can then legitimately fall
# back to the layered edge path over the just-verified dump when its own
# preflight rules out in-DuckDB edge derivation (the r13 sweep needed a
# manual retry for exactly this; both steps are automatic now).
run q110_ann_lsh_scaled python3 tools/check_lsh_sampled.py "$SF" "$OUT"
run q111_embedding_clusters python3 tools/check_clusters_scaled.py "$SF" "$OUT"
echo "== $(grep -c '^PASS' "$LOG") pass / $(grep -c '^FAIL' "$LOG" || true) fail (log: $LOG)"
