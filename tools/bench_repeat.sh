#!/usr/bin/env bash
# Suite-level noise floor (VERDICT r16 item 1): the CPU-bound control's
# spread (6.6-11.6%) under-read the real cross-run noise — two same-tree
# bench runs differed 22% normalized. The only honest noise floor is the
# spread of the FULL suite repeated back-to-back at one sha. This script
# runs graft.Bench N (>=5) times, records every total/normalized point,
# and writes bench/suite_noise.json — which graft.Bench then reads to (a)
# print `suite_spread_pct` on the contract line and (b) raise the
# delta_noise floor for round-over-round comparisons.
#
# Usage: tools/bench_repeat.sh [n=5] [sfDir=/root/testdata/sf0.1] [cpus=32]
# The tree must be clean (the floor is attributed to one sha).
set -euo pipefail
cd "$(dirname "$0")/.."
n=${1:-5}
sf_dir=${2:-/root/testdata/sf0.1}
cpus=${3:-32}
if [ -n "$(git status --porcelain)" ]; then
  echo "bench_repeat: worktree dirty — the noise floor is attributed to one sha; commit first" >&2
  exit 1
fi
sha=$(git rev-parse HEAD)
sbt -batch compile < /dev/null > /dev/null
echo "bench_repeat: $n runs at $sf_dir cpus=$cpus sha=$sha"
tmp=$(mktemp -d /tmp/bench_repeat.XXXX)
for i in $(seq 1 "$n"); do
  out="$tmp/run$i.json"
  SPARK_GRAFT_SF_DIR="$sf_dir" SPARK_GRAFT_CPUS="$cpus" \
    SPARK_GRAFT_BENCH_OUT="$out" \
    bash tools/run.sh graft.Bench > "$tmp/run$i.line" 2>"$tmp/run$i.err" \
    || { echo "bench_repeat: run $i FAILED"; tail -5 "$tmp/run$i.err"; exit 1; }
  python3 - "$out" <<'EOF'
import json, sys
d = json.load(open(sys.argv[1]))
print(f"  total={d['value']:.2f}s control={d['control']} control2={d.get('control2')} "
      f"normalized={d['normalized']} normalized2={d.get('normalized2')}")
EOF
done
python3 - "$tmp" "$n" "$sf_dir" "$cpus" "$sha" <<'EOF'
import json, os, sys
tmp, n, sf_dir, cpus, sha = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4], sys.argv[5]
runs = [json.load(open(f"{tmp}/run{i}.json")) for i in range(1, n + 1)]
def spread(xs):
    xs = sorted(xs)
    med = xs[len(xs)//2] if len(xs) % 2 else (xs[len(xs)//2-1]+xs[len(xs)//2])/2
    return round((max(xs)-min(xs))/med*100, 4) if med > 0 else 0.0
totals = [r["value"] for r in runs]
norm = [r["normalized"] for r in runs]
norm2 = [r.get("normalized2", 0.0) for r in runs]
ctl = [r["control"] for r in runs]
ctl2 = [r.get("control2", 0.0) for r in runs]
out = {
    "sha": sha, "sf": os.path.basename(sf_dir.rstrip("/")), "cpus": cpus, "n": n,
    # Freshness anchor (ADVICE r17): Bench ignores this floor once the
    # current GRAFT_ROUND is more than 2 rounds past this one.
    "round": int(os.environ["GRAFT_ROUND"]) if os.environ.get("GRAFT_ROUND", "").isdigit() else None,
    "totals": totals, "control": ctl, "control2": ctl2,
    "normalized": norm, "normalized2": norm2,
    "suite_spread_pct": spread(totals),
    "suite_norm_spread_pct": spread(norm),
    "suite_norm2_spread_pct": spread(norm2),
}
with open("bench/suite_noise.json", "w") as f:
    json.dump(out, f, indent=1)
print(f"bench_repeat: suite_spread_pct={out['suite_spread_pct']} (raw totals), "
      f"suite_norm_spread_pct={out['suite_norm_spread_pct']} (control-normalized), "
      f"suite_norm2_spread_pct={out['suite_norm2_spread_pct']} (shuffle-control-normalized)")
print("bench_repeat: wrote bench/suite_noise.json — commit it so graft.Bench "
      "carries suite_spread_pct on the contract line")
EOF
