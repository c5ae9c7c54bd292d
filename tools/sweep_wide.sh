#!/usr/bin/env bash
# Out-of-gate wide oracle sweep: dump every oracle-backed NON-ANCHOR
# registry query at a given corpus dir, then self-check each against
# DuckDB ONE QUERY AT A TIME, appending to a resumable log. The
# per-query loop exists because at sf>=10 the oracle side dominates
# (recursive-CTE clustering oracles run tens of minutes in DuckDB) and
# a single buffered selfcheck invocation reports nothing until the very
# end — with the loop, progress is visible and a re-run skips everything
# already logged PASS.
# Usage: tools/sweep_wide.sh <sfDir> <outDir> [logFile]
set -euo pipefail
cd "$(dirname "$0")/.."
SF="$1"; OUT="$2"; LOG="${3:-$OUT/selfcheck.log}"
ANCHORS="q31_dedup_ngram_jaccard q33_dedup_simhash q34_dedup_embedding q38_dedup_embedding_lsh"
names=$(python3 - "$OUT" <<'EOF'
import json, sys
o = json.load(open(f"{sys.argv[1]}/oracle_sql.json"))
anchors = {"q31_dedup_ngram_jaccard","q33_dedup_simhash",
           "q34_dedup_embedding","q38_dedup_embedding_lsh"}
print(" ".join(sorted(n for n in o if n not in anchors)))
EOF
)
mkdir -p "$OUT"; touch "$LOG"
for n in $names; do
  if grep -q "^PASS $n\$" "$LOG"; then continue; fi
  res=$(python3 tools/selfcheck.py "$SF" "$OUT" "$n" 2>&1 | grep -E "^(PASS|FAIL)" || true)
  echo "${res:-FAIL $n: selfcheck produced no verdict}" | tee -a "$LOG"
done
echo "== $(grep -c '^PASS' "$LOG") pass / $(grep -c '^FAIL' "$LOG" || true) fail (log: $LOG)"
