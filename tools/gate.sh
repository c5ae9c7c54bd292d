#!/usr/bin/env bash
# Pre-snapshot gate: never end a round with a broken build.
# 1. sbt Test/compile must succeed.
# 2. The flagship query (SparkEntry.entry on sf0.001) must return rows.
# Run this before every end-of-round commit.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch 'Test/compile' 'runMain graft.tools.Smoke' 2>&1 | tail -5
echo "GATE OK"
