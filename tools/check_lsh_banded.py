#!/usr/bin/env python3
"""Band-aware exact checker for `lshPairs` at an arbitrary (bands, bits,
threshold) point — the tractable-at-sf10/sf100 successor to
check_lsh_adaptive.py (VERDICT r17 item 1).

Why the old checker was slow: its candidate join WAS already bucketed by
band code, but every within-bucket candidate pair paid an interpreted
DuckDB `list_dot_product` — at sf10's (4 bands, 4 bits) point that is 16
buckets/band x C(~12.5k, 2) ~ 5e9 interpreted 64-dim dot products (hours).
This checker computes the same within-bucket pair enumeration as blockwise
BLAS Gram matrices (~6e11 flops at sf10 -> minutes), with EXACTNESS kept
by a two-phase scheme:

  phase 1 (filter, certified bound): for each (band, bucket), blockwise
    C = Y @ Y.T in float32 BLAS over PRE-NORMALIZED unit vectors
    (Y = X / ||X||, rounded to float32 — the inputs are float32-born, so
    only the normalization division rounds, <= 1 ulp_f32 per entry).
    Error bound on each estimated cosine: input rounding ~2*2^-24 plus
    sgemm accumulation <= dim * eps_f32 * sum|y_i z_i| <= 64 * 2^-24
    ~ 4e-6 (Cauchy-Schwarz bounds the unit-vector abs-sum by 1) — total
    well under the 1e-3 margin. Candidates are kept at cosine >=
    threshold - 1e-3, so no qualifying pair can be filtered out and only
    a thin near-threshold shell proceeds to phase 2. float32 halves the
    dominant cost (the threshold scan is memory-bandwidth-bound: ~4 TB of
    Gram traffic at sf100's (4,4) point in float64, ~2 TB in float32) and
    doubles BLAS throughput.
  phase 2 (exact): surviving candidates get the bit-exact engine value:
    float32 inputs widen to float64, so each product is EXACT (24-bit
    mantissas -> <=48-bit product fits float64); only ADDITION ORDER can
    round, and np.cumsum along the dim axis reproduces strict
    left-to-right summation — the order DuckDB's list_dot_product and the
    engine's expression both use (validated: this checker is hash-exact
    against check_lsh_adaptive.py's verdicts at sf0.001/0.01/0.1).
    norms: squares are exact, cumsum-sequential sum, IEEE sqrt; the final
    multiply+divide round identically everywhere.

Band codes use the same exact path (plane coefficients are +-1 from the
splitmix64 sequence functions.Mix.splitmix uses: bit 0 of
splitmix(p*64 + d); multiply by +-1 is exact, cumsum gives the sequential
sum), so bucket membership is bit-exact, not BLAS-approximate.

The candidate set is the union over bands of within-bucket pairs — the
DISTINCT of it equals the engine's first-colliding-band enumeration by
construction (same set, different dedup strategy; both keep each pair
once).

Usage: check_lsh_banded.py <sfDir> <sparkDumpDir> <bands> <bits> <threshold>
Prints PASS/FAIL in the sweep's verdict format; wall time on stderr.
"""
import sys
import time

import numpy as np
import pyarrow.dataset as ds

t0 = time.time()
sf_dir, dump = sys.argv[1], sys.argv[2]
BANDS, BITS = int(sys.argv[3]), int(sys.argv[4])
THRESH = float(sys.argv[5])
MARGIN = 1e-3  # >> the ~4e-6 float32 filter bound (docstring)
MASK = (1 << 64) - 1


def splitmix(z0: int) -> int:
    x = (z0 * 0x9E3779B97F4A7C15) & MASK
    x = ((x ^ (x >> 30)) * 0xBF58476D1CE4E5B9) & MASK
    x = ((x ^ (x >> 27)) * 0x94D049BB133111EB) & MASK
    return x ^ (x >> 31)


def log(msg: str) -> None:
    print(f"[lsh_banded +{time.time() - t0:.0f}s] {msg}", file=sys.stderr)


emb_tbl = ds.dataset(f"{sf_dir}/embeddings.parquet").to_table(
    columns=["vec_id", "embedding"])
vec_id = emb_tbl["vec_id"].to_numpy()
X32 = np.stack(emb_tbl["embedding"].to_numpy(zero_copy_only=False))
X = X32.astype(np.float64)  # float32 -> float64 is exact
n, dim = X.shape
log(f"{n} vectors x {dim} dims")


def seq_sum(prod: np.ndarray) -> np.ndarray:
    """Strict left-to-right float64 summation along the last axis."""
    return np.cumsum(prod, axis=-1)[..., -1]


# exact sequential norms (float64), and the float32 unit vectors the
# phase-1 filter runs on
nrm = np.sqrt(seq_sum(X * X))
Y32 = (X / nrm[:, None]).astype(np.float32)

# exact band codes: plane (p, d) coefficient = +-1 from splitmix bit 0
codes = np.zeros((n, BANDS), dtype=np.int64)
for b in range(BANDS):
    for i in range(BITS):
        p = b * BITS + i
        plane = np.array(
            [1.0 if splitmix(p * 64 + d) & 1 else -1.0 for d in range(dim)])
        dots = seq_sum(X * plane)  # products exact, sum sequential
        codes[:, b] |= (dots > 0).astype(np.int64) << i
log("codes done")

# candidate pairs per (band, bucket): blockwise BLAS Gram with margin
CHUNK = 2048
cand_a, cand_b = [], []
enumerated = 0
for b in range(BANDS):
    order = np.argsort(codes[:, b], kind="stable")
    sorted_codes = codes[order, b]
    starts = np.flatnonzero(
        np.r_[True, sorted_codes[1:] != sorted_codes[:-1]])
    bounds = np.r_[starts, len(sorted_codes)]
    for s, e in zip(bounds[:-1], bounds[1:]):
        idx = order[s:e]
        m = len(idx)
        if m < 2:
            continue
        enumerated += m * (m - 1) // 2
        Yb = Y32[idx]
        cut = np.float32(THRESH - MARGIN)
        for cs in range(0, m, CHUNK):
            ce = min(cs + CHUNK, m)
            C = Yb[cs:ce] @ Yb.T  # float32 BLAS, bounded error (docstring)
            # dedup unordered pairs: keep columns strictly after the row
            ri, ci = np.nonzero(C >= cut)
            keep = ci > (cs + ri)
            cand_a.append(idx[cs + ri[keep]])
            cand_b.append(idx[ci[keep]])
    log(f"band {b}: {enumerated} pairs enumerated so far")

if cand_a:
    a = np.concatenate(cand_a)
    b_ = np.concatenate(cand_b)
else:
    a = b_ = np.zeros(0, dtype=np.int64)
# orient by vec_id and dedup across bands (same set as first-colliding-band)
va, vb = vec_id[a], vec_id[b_]
lo_is_a = va < vb
pa = np.where(lo_is_a, a, b_)
pb = np.where(lo_is_a, b_, a)
key = vec_id[pa].astype(np.int64) * (1 << 32) | vec_id[pb].astype(np.int64)
_, uniq_idx = np.unique(key, return_index=True)
pa, pb = pa[uniq_idx], pb[uniq_idx]
log(f"{len(pa)} candidate pairs after margin+dedup")

# phase 2: exact sequential cosine for every candidate; exact threshold
qa, qb, qc = [], [], []
for cs in range(0, len(pa), 1 << 20):
    ce = min(cs + (1 << 20), len(pa))
    prod = X[pa[cs:ce]] * X[pb[cs:ce]]  # exact products
    dot = seq_sum(prod)
    cos = dot / (nrm[pa[cs:ce]] * nrm[pb[cs:ce]])
    keep = cos >= THRESH
    qa.append(vec_id[pa[cs:ce]][keep])
    qb.append(vec_id[pb[cs:ce]][keep])
    qc.append(cos[keep])
mine = np.rec.fromarrays(
    [np.concatenate(qa), np.concatenate(qb), np.concatenate(qc)],
    names="a,b,c")
mine.sort()
log(f"{len(mine)} qualifying pairs (exact)")

dump_tbl = ds.dataset(dump).to_table(columns=["vec_a", "vec_b", "cosine"])
theirs = np.rec.fromarrays(
    [dump_tbl["vec_a"].to_numpy(), dump_tbl["vec_b"].to_numpy(),
     dump_tbl["cosine"].to_numpy()], names="a,b,c")
theirs.sort()

name = f"lshPairs({BANDS},{BITS})@{sys.argv[5]} [banded/{enumerated} enum]"
if len(mine) == len(theirs) and bool(np.all(mine == theirs)):
    log(f"wall {time.time() - t0:.1f}s")
    print(f"PASS {name} ({len(mine)} rows exact)")
    sys.exit(0)
diff = "count" if len(mine) != len(theirs) else \
    f"first mismatch at row {int(np.argmin(mine == theirs))}"
print(f"FAIL {name}: checker={len(mine)} spark={len(theirs)} ({diff})")
sys.exit(1)
