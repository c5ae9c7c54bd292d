#!/usr/bin/env bash
# Pre-snapshot gate: never end a round with a broken build, and certify
# EXACTLY the tree the checks ran on.
# 1. ADVICE.md hygiene (VERDICT r13 item 1, tightened r15 per ADVICE r14):
#    every advice bullet BLOCK must contain its own "Status (rN):" line.
#    The old version compared global counts, so a bullet that accumulated
#    two Status lines across rounds masked another bullet with none.
# 2. The worktree must be clean: the gate certifies HEAD, and a dirty tree
#    means the checks ran on an unreproducible mix (VERDICT r14 item 3 —
#    two r14 closes had post-gate commits the gate never saw).
# 3. sbt Test/compile must succeed; the flagship query (SparkEntry.entry
#    on sf0.001) must return rows.
# 4. On success the certified HEAD sha is written to
#    bench/gate_certified_sha.txt. Round-close protocol: commit ONLY that
#    file, with the sha in the message — the close commit is then the last
#    commit and its parent IS the certified tree. Any further code commit
#    voids the certification (re-run the gate).
set -euo pipefail
cd "$(dirname "$0")/.."
# Self-install the compile-checking pre-commit hook (VERDICT r15 item 2):
# every gate run re-asserts it so a fresh clone or a pruned .git/hooks
# cannot drift back to hookless commits. r17 (ADVICE r16 item 4):
# `git rev-parse --git-path hooks` works in worktrees too (where .git is
# a file, not a dir), and a hook whose target DIFFERS from ours is
# re-linked (with a warning if it was a foreign hook) instead of silently
# winning forever.
hooks=$(git rev-parse --git-path hooks)
mkdir -p "$hooks"
want=$(readlink -f tools/pre-commit)
cur=$(readlink -f "$hooks/pre-commit" 2>/dev/null || true)
if [ "$cur" != "$want" ]; then
  if [ -e "$hooks/pre-commit" ]; then
    echo "gate: WARNING — replacing foreign pre-commit hook ($cur)" >&2
  fi
  ln -sf "$want" "$hooks/pre-commit"
  echo "gate: installed tools/pre-commit -> $hooks/pre-commit"
fi
if [ -f ADVICE.md ]; then
  missing=$(awk '
    /^- \*\*/ { if (inb && !has) print start; inb = 1; has = 0; start = NR; next }
    inb && /Status \(r[0-9]+\):/ { has = 1 }
    END { if (inb && !has) print start }
  ' ADVICE.md)
  if [ -n "$missing" ]; then
    echo "GATE FAIL: ADVICE.md bullet(s) starting at line(s)" $missing \
         "lack a 'Status (rN):' annotation — annotate or resolve each" \
         "item in the commit that addresses it" >&2
    exit 1
  fi
fi
if [ -n "$(git status --porcelain)" ]; then
  echo "GATE FAIL: worktree dirty — the gate certifies HEAD; commit (or" \
       "stash) everything first so the certified sha names the tree the" \
       "checks actually ran on:" >&2
  git status --porcelain | head >&2
  exit 1
fi
# Shared-compare self-test (VERDICT r17 item 5): pins the UNION-coerced
# slice hashing (q42's DECIMAL-vs-DOUBLE live catch) so no checker can
# reintroduce the native-type bug past a certification.
python3 tools/duckcompare.py
sbt -batch 'Test/compile' 'runMain graft.tools.Smoke' 2>&1 | tail -5
sha=$(git rev-parse HEAD)
echo "$sha" > bench/gate_certified_sha.txt
echo "GATE OK: certified $sha"
echo "  close with: git commit -m 'round close: gate certified $sha'" \
     "bench/gate_certified_sha.txt"
