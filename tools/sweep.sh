#!/usr/bin/env bash
# Full oracle sweep: Verify + DuckDB selfcheck at ALL generated scale
# factors (the driver gate only checks sf0.01; scale-dependent drift —
# sketch error growth, decimal overflow — hides at the other SFs).
set -euo pipefail
cd "$(dirname "$0")/.."
for sf in sf0.001 sf0.01 sf0.1; do
  out="/tmp/graft_sweep_$sf"
  # Verify prints per-query failures to STDERR — keep the combined stream
  fails=$(SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} bash tools/run.sh graft.Verify \
    "/root/testdata/$sf" "$out" 2>&1 | grep -E "\[verify\].*failed" || true)
  if [ -n "$fails" ]; then echo "$fails"; echo "== $sf: VERIFY FAILURES"; exit 1; fi
  echo "== $sf: $(python3 tools/selfcheck.py "/root/testdata/$sf" "$out" 2>&1 | tail -1)"
done
