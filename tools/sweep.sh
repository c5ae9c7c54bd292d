#!/usr/bin/env bash
# Full oracle sweep: Verify + DuckDB selfcheck at ALL generated scale
# factors (the driver gate only checks sf0.01; scale-dependent drift —
# sketch error growth, decimal overflow — hides at the other SFs).
set -euo pipefail
cd "$(dirname "$0")/.."
# Args: zero or more sf DIRS (default: the three driver-generated SFs).
# Out-of-tree corpora work too: `tools/sweep.sh /tmp/sf1` runs the full
# 110-query oracle sweep at sf1 (generate it with tools/gen_sf.py first).
dirs=("$@")
if [ ${#dirs[@]} -eq 0 ]; then
  dirs=(/root/testdata/sf0.001 /root/testdata/sf0.01 /root/testdata/sf0.1)
fi
for dir in "${dirs[@]}"; do
  sf=$(basename "$dir")
  out="/tmp/graft_sweep_$sf"
  # Verify prints per-query failures to STDERR — keep the combined stream
  fails=$(SPARK_GRAFT_CPUS=${SPARK_GRAFT_CPUS:-8} bash tools/run.sh graft.Verify \
    "$dir" "$out" 2>&1 | grep -E "\[verify\].*failed" || true)
  if [ -n "$fails" ]; then echo "$fails"; echo "== $sf: VERIFY FAILURES"; exit 1; fi
  echo "== $sf: $(python3 tools/selfcheck.py "$dir" "$out" 2>&1 | tail -1)"
done
# Seeded oracle fuzz (VERDICT r14 item 5): 50 parameterized instances at
# sf0.01 — catches tiebreak/rounding drift BETWEEN the registry's fixed
# points. GRAFT_FUZZ_SEED varies the batch; default reproduces the pinned
# r15 evidence run.
echo "== fuzz: $(python3 tools/fuzz_oracle.py /root/testdata/sf0.01 50 \
  "${GRAFT_FUZZ_SEED:-42}" 2>&1 | tail -1)"
