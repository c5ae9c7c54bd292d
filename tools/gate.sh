#!/usr/bin/env bash
# Pre-snapshot gate: never end a round with a broken build.
# 1. ADVICE.md hygiene (VERDICT r13 item 1): every advice bullet must
#    carry a builder-added "Status (rN):" annotation — two consecutive
#    rounds shipped a stale ADVICE.md, costing the next judge a
#    re-adjudication pass; this makes the annotate-in-the-fixing-commit
#    flow mechanical instead of remembered.
# 2. sbt Test/compile must succeed.
# 3. The flagship query (SparkEntry.entry on sf0.001) must return rows.
# Run this before every end-of-round commit.
set -euo pipefail
cd "$(dirname "$0")/.."
if [ -f ADVICE.md ]; then
  bullets=$(grep -c '^- \*\*' ADVICE.md || true)
  statuses=$(grep -c 'Status (r[0-9]*):' ADVICE.md || true)
  if [ "$bullets" -gt "$statuses" ]; then
    echo "GATE FAIL: ADVICE.md has $bullets advice bullets but only" \
         "$statuses 'Status (rN):' annotations — annotate or resolve" \
         "each item in the commit that addresses it" >&2
    exit 1
  fi
fi
sbt -batch 'Test/compile' 'runMain graft.tools.Smoke' 2>&1 | tail -5
echo "GATE OK"
