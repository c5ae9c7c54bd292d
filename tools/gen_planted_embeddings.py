#!/usr/bin/env python3
"""Probe corpus with PLANTED embedding near-duplicates at known cosine.

Why this exists (r12 VERDICT item 6): the driver-generated embeddings
tables have no cosine pairs above ~0.6, so the PRODUCTION dedup threshold
regime (>= 0.9) is structurally untestable against them — a 0.9-threshold
oracle passes on an empty relation at every SF (the documented
empty-result trap). This generator plants near-dup sets at controlled
cosine so `embeddingClusters(8, 8, 0.9)` can be hash-checked against the
label-propagation oracle (tools/check_clusters_scaled.py) on a corpus
where the production operating point has real component structure.

Geometry (deterministic, seeded):
- Background vectors: iid Gaussian, normalized. In d=64 the probability
  of a random pair exceeding cosine 0.9 is (1-0.9^2)^31 ~ 4e-23 — zero
  background edges at any corpus size we run, so every edge above the
  production threshold is a planted one (or a planted-star spoke).
- Planted groups (~2% of vectors, sizes 2-5): members are
  c*u + sqrt(1-c^2)*w_i with u the group base, w_i per-member orthogonal
  noise, so pairwise cosine ~ c^2 + (1-c^2)*cos(w_i, w_j). Two regimes
  are planted on purpose (measured on seed 7 at 20k):
    c=0.98 -> pairs 0.946..0.974: the whole group is a >=0.9 CLIQUE;
    c=0.93 -> pairs 0.806..0.924 STRADDLE the 0.9 threshold: only some
      edges survive, so components form through whichever edge subset
      clears it — exercises connected-components transitivity rather
      than just bucket equality.
- LSH recall at (8 bands, 8 bits) is ~0.96 per 0.92-edge, so SOME true
  edges are missed — irrelevant to the check: the oracle mirrors the
  same planes/banding, so both engines see the identical edge set.

Schema matches the driver tables exactly (vec_id int64, embedding
list<float32>, label int32); label carries the planted group id (-1 for
background) purely as generation metadata — no operator reads it.

Usage: gen_planted_embeddings.py <outDir> <nVectors> [seed=7]
"""
import os
import sys

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

out_dir = sys.argv[1]
n = int(sys.argv[2])
seed = int(sys.argv[3]) if len(sys.argv) > 3 else 7
dim = 64
rng = np.random.default_rng(seed)

vecs = rng.standard_normal((n, dim)).astype(np.float64)
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
labels = np.full(n, -1, dtype=np.int32)

# ~2% of vectors become members of planted groups
n_planted = max(4, int(n * 0.02))
group_sizes = []
while sum(group_sizes) < n_planted:
    group_sizes.append(int(rng.integers(2, 6)))
# planted member slots: a deterministic shuffled prefix of the id space
member_ids = rng.permutation(n)[:sum(group_sizes)]

pos = 0
for g, size in enumerate(group_sizes):
    ids = member_ids[pos:pos + size]
    pos += size
    c = 0.98 if g % 2 == 0 else 0.93  # clique regime / star regime
    u = rng.standard_normal(dim)
    u /= np.linalg.norm(u)
    for i in ids:
        w = rng.standard_normal(dim)
        w -= np.dot(w, u) * u  # orthogonalize
        w /= np.linalg.norm(w)
        vecs[i] = c * u + np.sqrt(1.0 - c * c) * w
        labels[i] = g

vecs = vecs.astype(np.float32)
# re-normalize in float32 so norms match the driver tables' ~1.0 +- eps
vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

os.makedirs(out_dir, exist_ok=True)
table = pa.table({
    "vec_id": pa.array(np.arange(n, dtype=np.int64)),
    "embedding": pa.FixedSizeListArray.from_arrays(
        pa.array(vecs.reshape(-1)), dim).cast(pa.list_(pa.float32())),
    "label": pa.array(labels),
})
pq.write_table(table, f"{out_dir}/embeddings.parquet", compression="zstd")
planted = int((labels >= 0).sum())
print(f"wrote {out_dir}/embeddings.parquet n={n} planted={planted} "
      f"groups={len(group_sizes)} seed={seed}")
