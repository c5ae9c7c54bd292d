#!/usr/bin/env bash
# Round-17 FULL-REGISTRY sf10 adjudicated sweep (VERDICT r16 item 4): sf1
# is swept end-to-end by tools/sweep.sh; sf10's prior evidence was
# per-family spot checks. This drives every oracle-backed registry query
# at the sf10 decade (60M lineitem / 10M events / 500k documents / 200k
# embeddings) through the oracle WHERE IT FITS and the documented exact
# adjudicators where a single-pass DuckDB formulation is structurally
# infeasible:
#   - default: tools/selfcheck_duck.py — selfcheck.py verdict semantics
#     with the compare run in-DuckDB (EXCEPT ALL both ways, spill-backed),
#     since results like the 60M-row master table exceed a pandas compare.
#   - q31/q48/q60/q92: tools/check_jaccard_scaled.py — ONE chunked exact
#     all-pairs jaccard relation (the 1.2B-row-at-sf10 aggregation that
#     OOMs any single DuckDB pass) adjudicates all four consumers.
#   - q38: tools/check_lsh_adaptive.py at its pinned (4 bands, 4 bits,
#     0.35) — the stored oracle's DISTINCT candidate materialization
#     (~2.5e9 rows at sf10) exceeds memory+spill; the first-colliding-band
#     rule is linear and validated against DISTINCT at the gate SFs.
#   - q110: tools/check_lsh_scaled.py — same rule for the (8,8) point
#     (~6e8 candidates at sf10, exact full re-enumeration).
#   - q111: tools/check_clusters_scaled.py — min-label propagation computes
#     the recursive reachability oracle's unique fixpoint in linear memory.
# Per-query resumable log, same format as sweep100.sh: a re-run skips
# everything already logged PASS.
# Usage: tools/sweep10.sh [sfDir=/tmp/sf10] [dumpDir=/tmp/v10] [logFile]
set -uo pipefail
cd "$(dirname "$0")/.."
SF="${1:-/tmp/sf10}"; OUT="${2:-/tmp/v10}"; LOG="${3:-$OUT/selfcheck.log}"
mkdir -p "$OUT"; touch "$LOG"

# Resume provenance for Verify's _GRAFT_STAMP (ADVICE r17): dumps are
# evidence only for the code that produced them.
# env override: pin the evidence sha when the only commits since
# are non-data-plane (tools/bench) — document the diff in PLANS.md.
GRAFT_CODE_SHA="${GRAFT_CODE_SHA:-$(git rev-parse HEAD 2>/dev/null || echo unset)}"
export GRAFT_CODE_SHA

# The PASS-line resume log is evidence with the same provenance rule: a
# log written against an older sha must not satisfy this run's resume
# grep. First line carries the sha; mismatch rotates the old log aside.
if [ -s "$LOG" ] && [ "$(head -1 "$LOG")" != "# sha $GRAFT_CODE_SHA" ]; then
  mv "$LOG" "$LOG.stale.$(head -1 "$LOG" | awk '{print $3}')" 2>/dev/null || true
  echo "[sweep10] rotated stale resume log (sha changed)" >&2
fi
[ -s "$LOG" ] || echo "# sha $GRAFT_CODE_SHA" > "$LOG"

# Scope hygiene (ADVICE r14): GRAFT_RECALL_ONLY would silently skip the
# precision half of the sampled LSH checker; a sweep is always full-scope.
unset GRAFT_RECALL_ONLY

# Disk safety (VERDICT r13 item 2): spill on the roomiest volume, refuse
# to start below a floor.
if [ -z "${GRAFT_DUCK_TMP:-}" ]; then
  best=$(df -P /tmp /var/tmp "$OUT" 2>/dev/null | awk 'NR>1 {print $4, $6}' \
    | sort -rn | head -1 | awk '{print $2}')
  export GRAFT_DUCK_TMP="${best:-/tmp}/duck_spill"
fi
mkdir -p "$GRAFT_DUCK_TMP"
free_gb=$(df -P "$GRAFT_DUCK_TMP" | awk 'NR==2 {print int($4/1048576)}')
echo "[sweep10] spill dir $GRAFT_DUCK_TMP (${free_gb} GB free)" >&2
if [ "$free_gb" -lt 20 ]; then
  echo "[sweep10] ABORT: ${free_gb} GB free is below the 20 GB floor" >&2
  exit 1
fi

# Dump via Verify's stamp-checked resume — ALWAYS invoked (ADVICE r17:
# an oracle_sql.json-existence skip here adjudicated a PREVIOUS round's
# dump as current evidence). Per-query _GRAFT_STAMP (code sha + sfDir)
# decides what is reusable: a fully current dump skims through in
# seconds, a stale or crashed one recomputes exactly the stale queries.
# COALESCE=0 keeps the 60M-row final stages parallel.
echo "[sweep10] $(date +%H:%M:%S) dump/resume registry at $SF (sha $GRAFT_CODE_SHA)" >&2
GRAFT_XMX="${GRAFT_XMX:-24g}" SPARK_GRAFT_CPUS="${SPARK_GRAFT_CPUS:-16}" \
  GRAFT_VERIFY_RESUME=1 GRAFT_VERIFY_COALESCE=0 \
  bash tools/run.sh graft.Verify "$SF" "$OUT" 2>&1 | tail -3
if [ ! -f "$OUT/oracle_sql.json" ]; then
  echo "[sweep10] ABORT: dump produced no oracle_sql.json" >&2; exit 1
fi

run() { # run <name> <cmd...> — resumable, scope-honest (sweep100's helper)
  local n="$1"; shift
  if grep -q "^PASS $n\b" "$LOG"; then return; fi
  echo "[sweep10] $(date +%H:%M:%S) checking $n" >&2
  local out res detail scope
  out=$("$@" 2>&1)
  res=$(printf '%s\n' "$out" | grep -E "^(PASS|FAIL)" | tail -1 || true)
  scope=$(printf '%s\n' "$out" | grep -E "^(WARN|SKIP)" | head -3 || true)
  if [ -n "$scope" ]; then
    printf '%s\n' "$scope" | sed "s/^/SCOPE $n: /" | tee -a "$LOG"
  fi
  case "$res" in
    PASS*)      echo "PASS $n" | tee -a "$LOG" ;;
    FAIL*": "*) echo "FAIL $n: ${res#FAIL*: }" | tee -a "$LOG" ;;
    FAIL*)      detail="${res#FAIL}"; echo "FAIL $n:${detail:- no detail}" \
                  | tee -a "$LOG" ;;
    *)          echo "FAIL $n: check produced no verdict" | tee -a "$LOG" ;;
  esac
}

JACCARD4="q31_dedup_ngram_jaccard q48_dedup_clusters q60_dedup_survivors q92_crosssource_dups"
SPECIAL="$JACCARD4 q38_dedup_embedding_lsh q110_ann_lsh_scaled q111_embedding_clusters"

# Everything with a stored oracle and no declared adjudicator: in-DuckDB
# multiset compare, cheap/linear queries first (sorted order is fine).
names=$(python3 - "$OUT" "$SPECIAL" <<'EOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
special = set(sys.argv[2].split())
print(" ".join(sorted(n for n in o if n not in special)))
EOF
)
for q in $names; do
  run "$q" python3 tools/selfcheck_duck.py "$SF" "$OUT" "$q"
done

# The chunked jaccard block adjudicates four queries in one pass — log
# each name so the resume grep and the final tally see first-class rows.
need4=0
for q in $JACCARD4; do grep -q "^PASS $q\b" "$LOG" || need4=1; done
if [ "$need4" -eq 1 ]; then
  echo "[sweep10] $(date +%H:%M:%S) chunked jaccard relation (q31/q48/q60/q92)" >&2
  out4=$(python3 tools/check_jaccard_scaled.py "$SF" "$OUT" 2>&1)
  printf '%s\n' "$out4" | grep "chunk" >&2 || true
  for q in $JACCARD4; do
    res=$(printf '%s\n' "$out4" | grep -E "^(PASS|FAIL) $q" | tail -1 || true)
    case "$res" in
      PASS*) echo "PASS $q" | tee -a "$LOG" ;;
      *)     echo "FAIL $q: ${res:-no verdict from chunked checker}" | tee -a "$LOG" ;;
    esac
  done
fi

# q38: the banded BLAS checker (VERDICT r17 item 1) — same exact verdict
# as check_lsh_adaptive.py (cross-validated at sf0.001/0.01/0.1), but the
# within-bucket Gram runs as blockwise float64 BLAS instead of 5e9
# interpreted list_dot_products, so the sf10 point closes in minutes.
run q38_dedup_embedding_lsh python3 tools/check_lsh_banded.py \
  "$SF" "$OUT/q38_dedup_embedding_lsh" 4 4 0.35
# q110 BEFORE q111 (sweep100 ordering): q111's checker can fall back to the
# verified q110 dump if its own edge derivation preflights out.
# r18: the banded BLAS checker replaces check_lsh_scaled here — the DuckDB
# full re-enumeration preflighted out at sf10 (est 96 GB spill, r17 fell
# back to the SAMPLED checker); banded enumerates all ~6e8 (8,8)
# candidates exactly in memory with zero spill (cross-validated vs
# check_lsh_scaled at sf0.001/0.01/0.1 — 46/42/735 rows exact).
run q110_ann_lsh_scaled python3 tools/check_lsh_banded.py \
  "$SF" "$OUT/q110_ann_lsh_scaled" 8 8 0.35
run q111_embedding_clusters python3 tools/check_clusters_scaled.py "$SF" "$OUT"

npass=$(grep -c '^PASS' "$LOG" || true)
nfail=$(grep -c '^FAIL' "$LOG" || true)
echo "== sf10: $npass pass / $nfail fail (log: $LOG)"
[ "$nfail" -eq 0 ] || exit 1
