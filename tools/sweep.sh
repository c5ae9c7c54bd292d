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
  # `|| true`: selfcheck exits 1 when ANY query fails, and under set -e a
  # bare $(…) assignment would abort the script right here — discarding
  # the captured output AND making the q111 re-adjudication block below
  # unreachable (r16 finding: the first sf1 sweep died exactly this way,
  # losing a 75-minute oracle run's verdict). Failures are judged from
  # the captured text, not the exit code.
  res=$(python3 tools/selfcheck.py "$dir" "$out" 2>&1 || true)
  summary=$(echo "$res" | tail -1)
  if ! echo "$summary" | grep -qE "pass / [0-9]+ fail"; then
    echo "$res" | tail -5; echo "== $sf: SELFCHECK CRASHED (no summary line)"; exit 1
  fi
  # Oracle-resource re-adjudication (r15): q111's recursive reachability
  # CTE is quadratic in component size — at sf>=1 percolation it exhausts
  # any bounded DuckDB budget while the Spark dump is fine (the sf1
  # constrained run hit exactly this). When q111-oracle-OOM is the ONLY
  # fail, re-check it through the linear label-prop checker (the designed
  # tool for percolated components at sf>=10) and report its verdict.
  nfail=$(echo "$res" | grep -c '^FAIL' || true)
  if echo "$res" | grep -q "^FAIL q111_embedding_clusters: oracle error: Out of Memory" \
     && [ "$nfail" -eq 1 ]; then
    if python3 tools/check_clusters_scaled.py "$dir" "$out" 2>&1 \
         | grep -q "^PASS q111_embedding_clusters"; then
      summary="$summary -> q111 oracle OOM re-adjudicated PASS via label-prop checker (0 real fails)"
      nfail=0
    else
      summary="$summary -> q111 label-prop re-check ALSO FAILED"
    fi
  fi
  echo "== $sf: $summary"
  # Real failures must fail the sweep (previously only printed): the gate
  # value of this script is its exit code.
  if [ "$nfail" -gt 0 ]; then echo "$res" | grep '^FAIL'; exit 1; fi
done
# Seeded oracle fuzz (VERDICT r14 item 5): 50 parameterized instances at
# sf0.01 — catches tiebreak/rounding drift BETWEEN the registry's fixed
# points. GRAFT_FUZZ_SEED varies the batch; default reproduces the pinned
# r15 evidence run.
fuzzline=$(python3 tools/fuzz_oracle.py /root/testdata/sf0.01 50 \
  "${GRAFT_FUZZ_SEED:-42}" 2>&1 | tail -1 || true)
echo "== fuzz: $fuzzline"
# Same exit-code discipline as the SF loop: a FAIL verdict (or a crash
# that produced no verdict) must fail the sweep, not just print.
echo "$fuzzline" | grep -q "^PASS fuzz" || exit 1
